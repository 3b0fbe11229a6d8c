"""Demos stay importable (syntax/API regressions surface here without paying
their full runtime)."""

import importlib.util
import pathlib

import pytest

DEMOS = sorted((pathlib.Path(__file__).parent.parent / "demos").glob("*.py"))


@pytest.mark.parametrize("path", DEMOS, ids=lambda p: p.stem)
def test_demo_imports(path):
    spec = importlib.util.spec_from_file_location(f"demo_{path.stem}", path)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)  # __main__ guards keep this cheap
    assert hasattr(mod, "main") or hasattr(mod, "run") or hasattr(mod, "stationary")
