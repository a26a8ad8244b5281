"""Test environment.

Note: in this image an `axon` PJRT plugin pins every Python process to
the TPU at interpreter startup (sitecustomize on PYTHONPATH) and
ignores JAX_PLATFORMS — so single-device tests run on whatever platform
the session provides, and multi-device sharding tests spawn a
subprocess with a scrubbed environment (see `cpu_mesh_env`)."""

import os
import subprocess
import importlib.util
import sys
import pathlib

import pytest

REPO = pathlib.Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))

# Persistent compilation cache: remote TPU compiles run ~40s/shape —
# cache them across test sessions.
try:
    import jax

    jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_comp_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
except Exception:
    pass

REFERENCE = pathlib.Path("/root/reference")


def load_reference_module(relpath: str, name: str):
    """Import a module from the read-only reference repo to use as a
    numerical oracle in parity tests (we never copy its code). Missing
    optional deps of the reference (torchvision) are stubbed — the
    oracle functions we call don't touch them."""
    path = REFERENCE / relpath
    if not path.exists():
        pytest.skip(f"reference oracle {relpath} not available")
    import types
    import unittest.mock as mock

    for stub in (
        "torchvision",
        "torchvision.transforms",
        "torchvision.transforms.functional",
        "torchvision.io",
        "torchvision.utils",
        "av",
    ):
        if stub not in sys.modules:
            try:
                importlib.import_module(stub)
            except ImportError:
                m = mock.MagicMock(name=stub)
                # a real ModuleSpec so importlib.util.find_spec() on the
                # stub (e.g. transformers' av probe) doesn't blow up
                m.__spec__ = importlib.machinery.ModuleSpec(stub, None)
                sys.modules[stub] = m
    # Register synthetic parent packages (without running their
    # __init__, which pulls unavailable deps) so the oracle module's
    # relative imports resolve against the reference tree.
    parts = relpath[:-3].split("/")  # e.g. slowfast/datasets/transform
    modname = ".".join(parts)
    for i in range(1, len(parts)):
        pkg = ".".join(parts[:i])
        if pkg not in sys.modules:
            pkg_mod = types.ModuleType(pkg)
            pkg_mod.__path__ = [str(REFERENCE / "/".join(parts[:i]))]
            sys.modules[pkg] = pkg_mod
    spec = importlib.util.spec_from_file_location(modname, path)
    mod = importlib.util.module_from_spec(spec)
    sys.modules[modname] = mod
    spec.loader.exec_module(mod)
    return mod


def run_in_cpu_mesh(script: str, n_devices: int = 8, timeout: int = 600):
    """Run a Python snippet in a subprocess with an n-device virtual CPU
    mesh (JAX_PLATFORMS=cpu; axon sitecustomize disabled)."""
    env = dict(os.environ)
    env["PYTHONPATH"] = str(REPO)
    env["JAX_PLATFORMS"] = "cpu"
    env["XLA_FLAGS"] = f"--xla_force_host_platform_device_count={n_devices}"
    proc = subprocess.run(
        ["python", "-c", script], env=env, capture_output=True, text=True, timeout=timeout
    )
    assert proc.returncode == 0, f"stdout:\n{proc.stdout}\nstderr:\n{proc.stderr}"
    return proc.stdout


@pytest.fixture(scope="session")
def ref_merge():
    return load_reference_module("tome/merge.py", "ref_tome_merge")


@pytest.fixture(scope="session")
def ref_utils():
    return load_reference_module("tome/utils.py", "ref_tome_utils")
