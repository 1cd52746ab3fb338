"""Every module imports cleanly (catches dangling imports / syntax rot)."""

import importlib
import pkgutil

import pytest

import vit_grid_model_tpu


def _walk(pkg):
    for m in pkgutil.walk_packages(pkg.__path__, pkg.__name__ + "."):
        yield m.name


@pytest.mark.parametrize("name", sorted(_walk(vit_grid_model_tpu)))
def test_import(name):
    importlib.import_module(name)
