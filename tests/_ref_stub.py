"""Auto-stub importer so the read-only reference package imports on CPU
without its optional heavy deps (nuscenes devkit, open3d, timm, ...).

Used ONLY by parity tests that compare our models numerically against the
reference architectures; nothing from the reference is copied into the
framework.
"""

from __future__ import annotations

import importlib.abc
import importlib.machinery
import importlib.util
import sys
import types


class _Any:
    def __getattr__(self, k):
        return _Any()

    def __call__(self, *a, **k):
        return _Any()

    def __mro_entries__(self, bases):
        return (object,)


class _AnyModule(types.ModuleType):
    __path__: list = []

    def __getattr__(self, k):
        if k.startswith("__"):
            raise AttributeError(k)
        return _Any()


class _StubFinder(importlib.abc.MetaPathFinder, importlib.abc.Loader):
    def __init__(self, roots):
        self.roots = roots

    def find_spec(self, name, path=None, target=None):
        if name.split(".")[0] in self.roots:
            spec = importlib.machinery.ModuleSpec(name, self)
            spec.submodule_search_locations = []
            return spec
        return None

    def create_module(self, spec):
        return _AnyModule(spec.name)

    def exec_module(self, module):
        pass


_INSTALLED = False


def install_reference(path="/root/reference"):
    """Put the reference on sys.path with missing deps stubbed."""
    global _INSTALLED
    if _INSTALLED:
        return
    candidates = ("nuscenes", "pyquaternion", "open3d", "tensorboardX",
                  "timm", "plyfile")
    missing = []
    for r in candidates:
        try:
            if importlib.util.find_spec(r) is None:
                missing.append(r)
        except (ImportError, ValueError):
            missing.append(r)
    sys.meta_path.insert(0, _StubFinder(tuple(missing)))
    sys.path.insert(0, path)
    _INSTALLED = True
