"""Test harness: force an 8-device virtual CPU mesh (SURVEY.md §4 item 3).

Must set env vars before jax initializes a backend.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

# The environment's sitecustomize force-registers the remote-TPU ("axon")
# backend and sets jax_platforms="axon,cpu"; tests must run on the local
# 8-device virtual CPU mesh, so override after import (backend init is lazy).
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_threefry_partitionable", True)

# persistent compilation cache: repeat test runs skip XLA compiles.
# The dir name carries a host-CPU fingerprint: XLA:CPU AOT results bake in
# machine features (AMX, prefer-no-scatter, ...) and a cache populated on a
# different host loads with "could lead to execution errors such as SIGILL"
# warnings — stale foreign executables must never serve this machine.
import hashlib  # noqa: E402

try:
    with open("/proc/cpuinfo") as _f:
        _cpu = next((ln for ln in _f if ln.startswith("flags")), "")
except OSError:
    _cpu = ""
_fp = hashlib.sha1(_cpu.encode()).hexdigest()[:8]
jax.config.update("jax_compilation_cache_dir",
                  f"/tmp/ppt_jax_test_cache_{_fp}")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)

import pytest  # noqa: E402


def pytest_addoption(parser):
    parser.addoption(
        "--run-slow", action="store_true", default=False,
        help="run tests marked slow (production-dim composed oracles)",
    )


# fast tier (`make test-fast` / `pytest -m fast`): files whose tests run
# without multi-minute XLA pipeline compiles — host logic, converters,
# scheduler table math, native C++ bindings, serving glue.  The in-round
# hygiene gate on a 1-CPU box; expected wall times per tier are in
# README.md "Tests".
FAST_FILES = {
    "test_api_surface.py",
    "test_aux_components.py",
    "test_batcher.py",
    "test_controller_validation.py",
    "test_convert.py",
    "test_native.py",
    "test_scheduler_exactness.py",
    "test_schedulers.py",
    "test_serve_io.py",
    "test_tokenizer.py",
}


def pytest_collection_modifyitems(config, items):
    import os as _os

    for item in items:
        if _os.path.basename(str(item.fspath)) in FAST_FILES:
            item.add_marker(pytest.mark.fast)
    if config.getoption("--run-slow") or os.environ.get("RUN_SLOW") == "1":
        return
    skip = pytest.mark.skip(reason="slow: opt in with --run-slow / RUN_SLOW=1")
    for item in items:
        if "slow" in item.keywords:
            item.add_marker(skip)
