"""Import every module in the package — catches dead imports/typos."""

import importlib
import pkgutil

import robustart_tpu


def test_import_all_modules():
    failures = []
    for mod in pkgutil.walk_packages(robustart_tpu.__path__,
                                     prefix="robustart_tpu."):
        try:
            importlib.import_module(mod.name)
        except Exception as exc:  # pragma: no cover
            failures.append((mod.name, repr(exc)))
    assert not failures, failures
