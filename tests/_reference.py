"""Import helpers for golden-testing against the read-only reference at
/root/reference. Stubs the reference's unavailable third-party imports
(prettytable, wandb, skimage) and patches its hardcoded MPS device to CPU so
its modules run in this environment. Reference code is never modified or
copied — only imported."""

import sys
import types

_REFERENCE = "/root/reference"


def _stub(name, **attrs):
    if name in sys.modules:
        return
    mod = types.ModuleType(name)
    for k, v in attrs.items():
        setattr(mod, k, v)
    sys.modules[name] = mod


class _FakePrettyTable:
    def __init__(self, *a, **k):
        self.rows = []

    def add_row(self, row):
        self.rows.append(row)

    def __str__(self):
        return "\n".join(map(str, self.rows))


def import_reference(module_name):
    """Import a module from /root/reference with stubs installed."""
    _stub("prettytable", PrettyTable=_FakePrettyTable)
    _stub("wandb")
    _stub("skimage")
    _stub("skimage.transform")
    if _REFERENCE not in sys.path:
        sys.path.insert(0, _REFERENCE)
    import importlib
    mod = importlib.import_module(module_name)
    import torch
    # The reference defines mps_device only when MPS is available
    # (decoder.py:5-6, train.py:34-35); its forward paths reference it
    # unconditionally. Point it at CPU for golden runs.
    if not hasattr(mod, "mps_device"):
        mod.mps_device = torch.device("cpu")
    return mod
