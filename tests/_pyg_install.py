"""Install tests/pyg_fixture.py as the ``torch_geometric`` modules so
the reference code imports a faithful implementation instead of a crash
stub. Mutates existing module objects in place (other parity test files
may have registered bare stubs earlier in the same pytest session, and
already-imported reference modules hold references to those objects)."""

import sys
import types


def install_torch_geometric():
    import pyg_fixture

    mods = {}
    for name in ("torch_geometric", "torch_geometric.nn",
                 "torch_geometric.utils"):
        mod = sys.modules.get(name)
        if mod is None:
            mod = types.ModuleType(name)
            sys.modules[name] = mod
        mods[name] = mod
    tg = mods["torch_geometric"]
    tg.nn = mods["torch_geometric.nn"]
    tg.utils = mods["torch_geometric.utils"]
    tg.nn.GATv2Conv = pyg_fixture.GATv2Conv
    tg.nn.GATConv = pyg_fixture.GATConv
    tg.nn.Sequential = pyg_fixture.Sequential
    tg.utils.dense_to_sparse = pyg_fixture.dense_to_sparse


def install_torchvision_stub():
    """The reference package __init__ imports dfcvae -> torchvision;
    DFCVAE parity is covered separately (tests/test_vgg_parity.py)."""
    for name in ("torchvision", "torchvision.models"):
        if name not in sys.modules:
            sys.modules[name] = types.ModuleType(name)
    sys.modules["torchvision"].models = sys.modules["torchvision.models"]
    if not hasattr(sys.modules["torchvision.models"], "vgg19_bn"):
        sys.modules["torchvision.models"].vgg19_bn = \
            lambda *a, **k: (_ for _ in ()).throw(RuntimeError("stub"))
