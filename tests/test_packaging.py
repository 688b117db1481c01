"""Packaging contract: pyproject.toml parses, its console entry points
resolve to importable callables, and the dynamic version matches the
package. Keeps `pip install .` viable without ever running pip in CI."""

import importlib
import os
import tomllib

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.fixture(scope="module")
def pyproject():
    with open(os.path.join(REPO, "pyproject.toml"), "rb") as f:
        return tomllib.load(f)


def test_pyproject_parses(pyproject):
    assert pyproject["project"]["name"] == "sod100k-tpu"
    assert "version" in pyproject["project"]["dynamic"]


def test_dynamic_version_attr(pyproject):
    attr = pyproject["tool"]["setuptools"]["dynamic"]["version"]["attr"]
    mod_name, _, attr_name = attr.rpartition(".")
    mod = importlib.import_module(mod_name)
    version = getattr(mod, attr_name)
    parts = version.split(".")
    assert len(parts) >= 2 and all(p.isdigit() for p in parts)


def test_console_scripts_resolve(pyproject):
    scripts = pyproject["project"]["scripts"]
    assert len(scripts) >= 7
    for name, target in scripts.items():
        mod_name, _, fn_name = target.partition(":")
        mod = importlib.import_module(mod_name)
        assert callable(getattr(mod, fn_name)), f"{name} -> {target}"


def test_package_find_covers_all_subpackages(pyproject):
    include = pyproject["tool"]["setuptools"]["packages"]["find"]["include"]

    def covered(pkg):
        return any(pkg == pat.rstrip("*") or pkg.startswith(pat.rstrip("*"))
                   for pat in include)

    for root, dirs, files in os.walk(os.path.join(REPO, "sod100k_tpu")):
        if "__init__.py" in files:
            rel = os.path.relpath(root, REPO).replace(os.sep, ".")
            assert covered(rel), f"package {rel} not covered by {include}"
    assert covered("cli")


def test_bench_check_compare_logic():
    """Perf-regression guard semantics: throughput rows fail when slower
    than tolerance, latency rows when higher; improvements always pass."""
    import importlib.util

    spec = importlib.util.spec_from_file_location(
        "bench_check", os.path.join(REPO, "tools", "bench_check.py"))
    bc = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(bc)

    ok, _ = bc.compare("x_img_per_sec[a]", 90.0, 100.0, 0.15)
    assert ok
    ok, _ = bc.compare("x_img_per_sec[a]", 80.0, 100.0, 0.15)
    assert not ok
    ok, _ = bc.compare("x_img_per_sec[a]", 130.0, 100.0, 0.15)
    assert ok
    ok, _ = bc.compare("y_infer_latency_ms[b]", 1.10, 1.0, 0.15)
    assert ok
    ok, _ = bc.compare("y_infer_latency_ms[b]", 1.30, 1.0, 0.15)
    assert not ok
    ok, _ = bc.compare("y_infer_latency_ms[b]", 0.7, 1.0, 0.15)
    assert ok
    # every guarded metric has a recorded reference
    import json

    ref = json.load(open(os.path.join(REPO, "tools", "bench_reference.json")))
    for m in bc.GUARDED_EXTRAS:
        assert m in ref, m
