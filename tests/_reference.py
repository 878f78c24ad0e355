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
    """Import a module from /root/reference with stubs installed.

    Loaded by explicit file path (not sys.path) because several reference
    modules share names with this repo's own CLI entry points
    (generate_json_data*.py) and pytest keeps the repo root at the front of
    sys.path during collection.
    """
    _stub("prettytable", PrettyTable=_FakePrettyTable)
    _stub("wandb")
    _stub("skimage")
    _stub("skimage.transform")
    # Intra-reference imports (decoder imports attention) resolve via
    # sys.path; keep /root/reference available but never ahead of stubs.
    if _REFERENCE not in sys.path:
        sys.path.append(_REFERENCE)
    import importlib.util
    cache_key = f"_reference_{module_name}"
    if cache_key in sys.modules:
        return sys.modules[cache_key]
    spec = importlib.util.spec_from_file_location(
        module_name, f"{_REFERENCE}/{module_name}.py")
    mod = importlib.util.module_from_spec(spec)
    sys.modules[cache_key] = mod
    spec.loader.exec_module(mod)
    import torch
    # The reference defines mps_device only when MPS is available
    # (decoder.py:5-6, train.py:34-35); its forward paths reference it
    # unconditionally. Point it at CPU for golden runs.
    if not hasattr(mod, "mps_device"):
        mod.mps_device = torch.device("cpu")
    return mod
