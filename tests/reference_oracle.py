"""Load reference PyTorch modules from /root/reference as *test oracles*.

The reference repo is mounted read-only and is used only to generate golden
values for parity tests — its code is never imported by the framework itself.
Loaded via importlib directly from file paths because the reference package
pulls in unavailable deps (hydra, lightning) at package-__init__ level.
"""
import importlib.util
import pathlib
import sys

REFERENCE = pathlib.Path("/root/reference")


def load_module(relpath: str, name: str):
    path = REFERENCE / relpath
    if not path.exists():
        return None
    spec = importlib.util.spec_from_file_location(name, path)
    mod = importlib.util.module_from_spec(spec)
    sys.modules[name] = mod
    spec.loader.exec_module(mod)
    return mod


def load_reference_modedit():
    return load_module("mode/models/networks/modedit.py", "ref_modedit")
