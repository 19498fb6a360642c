"""The examples double as the acceptance harness (reference: SURVEY §6 —
its examples are executable documentation). Every example must keep
running; each asserts its own known solution internally.
"""
import os
import pathlib
import subprocess
import sys

import pytest

EXAMPLES = sorted(
    p.name for p in (pathlib.Path(__file__).parent.parent / "examples").glob("*.py")
    if p.name != "_common.py"
)


@pytest.mark.parametrize("name", EXAMPLES)
def test_example_runs(name):
    root = pathlib.Path(__file__).parent.parent
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    proc = subprocess.run(
        [sys.executable, name],
        cwd=root / "examples",
        env=env,
        capture_output=True,
        text=True,
        timeout=360,
    )
    assert proc.returncode == 0, (
        f"example {name} failed:\n{proc.stdout[-2000:]}\n{proc.stderr[-2000:]}"
    )
