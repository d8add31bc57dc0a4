"""On-hardware test tier: runs on the REAL TPU chip (no CPU pinning).

The main suite (tests/) pins the CPU backend for the bitwise oracle-parity
contract; everything Mosaic-compiled was therefore only logic-tested
through the Pallas interpreter. This tier asserts the compiled kernels on
silicon: run `python -m pytest tests_tpu/ -q` on a machine where
jax.default_backend() is tpu/axon (VERDICT.md round-1 item #2; the
.claude/skills/verify recipe runs it before benching).

Skips cleanly (collection-level) when no TPU is attached so `pytest` from
a CPU box doesn't fail.
"""

import jax
import pytest

requires_tpu = pytest.mark.skipif(
    jax.default_backend() not in ("tpu", "axon"),
    reason="needs a real TPU chip (backend is %s)" % jax.default_backend(),
)


def pytest_collection_modifyitems(config, items):
    for item in items:
        item.add_marker(requires_tpu)
