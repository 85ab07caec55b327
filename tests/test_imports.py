"""Import smoke test over the whole package (the reference's sphinx-docs CI
doubles as an import check — SURVEY.md §4.2)."""

import importlib
import pkgutil

import pytest

pytest.importorskip("jax")

import wespeaker_tpu  # noqa: E402


def _walk(pkg):
    for mod in pkgutil.walk_packages(pkg.__path__, pkg.__name__ + "."):
        yield mod.name


@pytest.mark.parametrize("name", sorted(_walk(wespeaker_tpu)))
def test_module_imports(name):
    importlib.import_module(name)
