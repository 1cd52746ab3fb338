"""Convert framework pytrees back into reference torch checkpoints.

The inverse of ``core.torch_import``: a ``metnet3_init``-shaped pytree (our
trained weights, an EMA copy, or an imported-and-modified checkpoint) maps
onto the exact ``state_dict`` of the reference ``MetNet3`` /
``MetNet3_with_stn_imgs`` modules (``/root/reference/src/metnet3.py:191,518``
— identical parameter sets), so a reference user can take a TPU-trained
model back into their existing torch evaluation infrastructure, including
the ``DataParallel``-prefixed ``.pkt`` layout the shipped checkpoint uses
(``evaluation_vit.py:107-109``).

Layout changes are the exact inverses of the import side:

* conv kernels   HWIO -> OIHW
* linear weights (in, out) -> (out, in)
* conv-transpose kernels: un-flip the spatial taps, (kh,kw,in,out) ->
  torch's (in, out, kh, kw)
* ChanLayerNorm vectors (C,) -> torch's (1, C, 1, 1) (``metnet3.py:98-99``)
* BatchNorm gains its ``num_batches_tracked`` counter (0: the reference
  only ever consumes running stats in eval mode)

Round-trip identity (export -> import == identity, strict ``load_state_dict``
into the actual reference module, forward parity) is pinned by
``tests/test_torch_export.py``.
"""

from __future__ import annotations

from typing import Dict

import numpy as np

from vit_grid_model_tpu.core.config import MetNet3Config


def _f32(a) -> np.ndarray:
    # np.array (not asarray): jax device arrays export as read-only numpy
    # views, and torch.from_numpy on those is undefined behavior
    return np.array(a, dtype=np.float32)


def _conv(w) -> np.ndarray:
    """HWIO -> OIHW (inverse of ``torch_import._conv``)."""
    return np.transpose(_f32(w), (3, 2, 0, 1))


def _conv_transpose(w) -> np.ndarray:
    """Flipped HWIO (kh, kw, in, out) -> torch ConvTranspose2d
    (in, out, kh, kw) (inverse of ``torch_import._conv_transpose``)."""
    w = np.transpose(_f32(w), (2, 3, 0, 1))
    return np.flip(w, axis=(2, 3)).copy()


def _lin(w) -> np.ndarray:
    return np.transpose(_f32(w)).copy()


def _emit_conv(out, prefix, p) -> None:
    out[f"{prefix}.weight"] = _conv(p["w"])
    if "b" in p:
        out[f"{prefix}.bias"] = _f32(p["b"])


def _emit_lin(out, prefix, p) -> None:
    out[f"{prefix}.weight"] = _lin(p["w"])
    if "b" in p:
        out[f"{prefix}.bias"] = _f32(p["b"])


def _emit_bn(out, prefix, p) -> None:
    out[f"{prefix}.weight"] = _f32(p["scale"])
    out[f"{prefix}.bias"] = _f32(p["bias"])
    out[f"{prefix}.running_mean"] = _f32(p["mean"])
    out[f"{prefix}.running_var"] = _f32(p["var"])
    # the reference only evaluates (eval mode reads running stats); a fresh
    # counter round-trips through torch.save/load as a 0-d int64 tensor
    out[f"{prefix}.num_batches_tracked"] = np.array(0, dtype=np.int64)


def _emit_block(out, prefix, p) -> None:
    """Block = Conv2d proj + ChanLayerNorm (``metnet3.py:110-126``); the
    norm's g/b are (1, C, 1, 1) in torch (``metnet3.py:98-99``)."""
    _emit_conv(out, f"{prefix}.proj", p["proj"])
    out[f"{prefix}.norm.g"] = _f32(p["norm"]["g"]).reshape(1, -1, 1, 1)
    out[f"{prefix}.norm.b"] = _f32(p["norm"]["b"]).reshape(1, -1, 1, 1)


def _emit_resnet_block(out, prefix, p) -> None:
    _emit_block(out, f"{prefix}.block1", p["block1"])
    _emit_block(out, f"{prefix}.block2", p["block2"])
    if "mlp" in p:                       # Sequential(ReLU, Linear) -> .1
        _emit_lin(out, f"{prefix}.mlp.1", p["mlp"])
    if "res_conv" in p:
        _emit_conv(out, f"{prefix}.res_conv", p["res_conv"])


def _emit_mbconv(out, prefix, p, *, residual: bool) -> None:
    """MBConv Sequential indices per ``maxvit.py:87-97``; when the block has
    a residual (non-first layer of a stage: ``dim_in == dim_out and not
    downsample``, ``maxvit.py:99-100``) every name gains a ``fn.`` segment
    from the MBConvResidual wrapper."""
    if residual:
        prefix = f"{prefix}.fn"
    _emit_conv(out, f"{prefix}.0", p["expand"])
    _emit_bn(out, f"{prefix}.1", p["bn1"])
    _emit_conv(out, f"{prefix}.3", p["dw"])
    _emit_bn(out, f"{prefix}.4", p["bn2"])
    _emit_lin(out, f"{prefix}.6.gate.1", p["se"]["fc1"])   # bias=False
    _emit_lin(out, f"{prefix}.6.gate.3", p["se"]["fc2"])   # bias=False
    _emit_conv(out, f"{prefix}.7", p["project"])
    _emit_bn(out, f"{prefix}.8", p["bn3"])


def _emit_attention(out, prefix, p) -> None:
    if p.get("norm"):                    # affine LayerNorm only when uncond
        out[f"{prefix}.norm.weight"] = _f32(p["norm"]["g"])
        out[f"{prefix}.norm.bias"] = _f32(p["norm"]["b"])
    if "film" in p:                      # Sequential(Linear, SiLU, Linear)
        _emit_lin(out, f"{prefix}.film.0", p["film"]["fc1"])
        _emit_lin(out, f"{prefix}.film.2", p["film"]["fc2"])
    _emit_lin(out, f"{prefix}.to_qkv", p["to_qkv"])        # bias=False
    out[f"{prefix}.q_norm.gamma"] = _f32(p["q_norm"]["gamma"])
    out[f"{prefix}.k_norm.gamma"] = _f32(p["k_norm"]["gamma"])
    _emit_lin(out, f"{prefix}.to_out.0", p["to_out"])      # bias=False
    out[f"{prefix}.rel_pos_bias.weight"] = _f32(p["rel_pos_bias"]["table"])


def export_metnet3_state_dict(params, cfg: MetNet3Config, *,
                              data_parallel: bool = False
                              ) -> Dict[str, np.ndarray]:
    """``metnet3_init``-shaped pytree -> reference ``MetNet3`` state_dict
    ({name: numpy}).  ``data_parallel=True`` adds the ``module.`` prefix of
    the shipped ``DataParallel`` checkpoint (``evaluation_vit.py:107``)."""
    out: Dict[str, np.ndarray] = {}
    out["condition_lead_time.weight"] = _f32(
        params["condition_lead_time"]["table"])
    for i, emb in enumerate(params["condition_model_time"]):
        out[f"condition_model_time.{i}.weight"] = _f32(emb["table"])
    for name in ("resnet1", "resnet2"):
        for i, blk in enumerate(params[name]["blocks"]):
            _emit_resnet_block(out, f"{name}.blocks.{i}", blk)
    flat = 0
    for depth in cfg.depth_tuple:
        for ind in range(depth):
            layer = params["vit"]["layers"][flat]
            _emit_mbconv(out, f"vit.layers.{flat}.0", layer["conv"],
                         residual=ind > 0)
            _emit_attention(out, f"vit.layers.{flat}.1", layer["block_attn"])
            _emit_attention(out, f"vit.layers.{flat}.2", layer["grid_attn"])
            out[f"vit.register_tokens.{flat}"] = _f32(
                layer["register_tokens"])
            flat += 1
    out["up.weight"] = _conv_transpose(params["up"]["w"])
    out["up.bias"] = _f32(params["up"]["b"])
    # class boundaries are persistent torch buffers (``metnet3.py:249,253``),
    # registered per enabled head; the pytree keeps them in config instead
    for head, bounds in (("classifier_pm25", cfg.pm25_boundaries),
                         ("classifier_pm10", cfg.pm10_boundaries)):
        if head in params:
            _emit_conv(out, head, params[head])
            out[head.replace("classifier_", "") + "_boundaries"] = _f32(
                bounds)
    if data_parallel:
        out = {f"module.{k}": v for k, v in out.items()}
    return out


def save_torch_checkpoint(params, cfg: MetNet3Config, path: str, *,
                          data_parallel: bool = True) -> None:
    """Write a reference-loadable ``.pkt``: ``torch.save`` of the exported
    state_dict, ``module.``-prefixed by default like the shipped blob, so
    ``evaluation_vit.py:109``'s ``load_state_dict`` consumes it as-is."""
    import torch  # local import: torch is only needed for serialization

    sd = export_metnet3_state_dict(params, cfg, data_parallel=data_parallel)
    torch.save({k: torch.from_numpy(np.ascontiguousarray(v))
                for k, v in sd.items()}, path)


def main(argv=None) -> None:
    """``python -m vit_grid_model_tpu.core.torch_export in.npz out.pkt``:
    convert a framework params checkpoint (``core.checkpoint.save_params``
    output, e.g. from ``cli.train_vit``) into a reference ``.pkt``."""
    import argparse

    p = argparse.ArgumentParser(
        description="export a trained params checkpoint to a reference "
                    "torch .pkt")
    p.add_argument("src", help="framework params .npz")
    p.add_argument("dst", help="output torch checkpoint (.pkt)")
    p.add_argument("--hidden_dim", type=int, default=128)
    p.add_argument("--output_dim", type=int, default=12)
    p.add_argument("--input_dim", type=int, default=13)
    p.add_argument("--feat_dim", type=int, default=12)
    p.add_argument("--no_data_parallel", action="store_true",
                   help="omit the 'module.' DataParallel key prefix")
    args = p.parse_args(argv)

    import jax

    from vit_grid_model_tpu.core.checkpoint import restore_params
    from vit_grid_model_tpu.models.metnet3 import metnet3_init
    from vit_grid_model_tpu.utils.relay import require_backend_reachable

    require_backend_reachable(force_cpu=True)
    jax.config.update("jax_platforms", "cpu")    # shape-only work
    cfg = MetNet3Config(
        window_size=args.input_dim + args.output_dim, n_variables=24,
        n_start_channels=args.hidden_dim, end_lead_time=args.output_dim)
    params = restore_params(args.src,
                            metnet3_init(jax.random.PRNGKey(0), cfg))
    save_torch_checkpoint(params, cfg, args.dst,
                          data_parallel=not args.no_data_parallel)
    print(f"wrote {args.dst} ({len(jax.tree.leaves(params))} tensors)")


if __name__ == "__main__":
    main()
