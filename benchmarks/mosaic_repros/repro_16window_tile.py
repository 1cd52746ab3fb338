"""Round-2 crash repro: 16-window tiles (half the program count).

Same per-head structure as the shipping kernel, blk=16 instead of 8 —
every in-kernel array doubles its leading dim.  Round 2 reported this
crashes the Mosaic compiler at the flagship geometry.

Run: PYTHONPATH=. python benchmarks/mosaic_repros/repro_16window_tile.py
"""
import sys

sys.path.insert(0, ".")
from benchmarks.mosaic_repros import common as C
from benchmarks.mosaic_repros.repro_baseline_perhead import build


if __name__ == "__main__":
    x, wqkv, bias = C.inputs(blk=16)
    # default 16MB scoped vmem OOMs (22.14M needed — the round-2 'crash');
    # run both to document the failure AND whether a raised limit unblocks it
    C.run_repro("per-head loop, blk=16 tiles (default 16MB vmem)",
                build(blk=16), x, wqkv, bias)
    C.run_repro("per-head loop, blk=16 tiles (64MB vmem limit)",
                build(blk=16, vmem_mb=64), x, wqkv, bias)
