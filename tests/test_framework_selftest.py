"""Test-core self-test suite through pytest (ref: core_test's dual role as
executable test suite and regression gate, mpas_test_core.F:86-171)."""

import pytest

from mpas_tpu.cores.test_core.core import ALL_TESTS, run_all


@pytest.mark.parametrize("name", sorted(ALL_TESTS))
def test_selftest(name):
    ok, detail = ALL_TESTS[name]()
    assert ok, f"{name}: {detail}"


def test_run_all_reports_every_test():
    logs = []
    results = run_all(log=logs.append)
    assert set(results) == set(ALL_TESTS)
    assert len(logs) == len(ALL_TESTS)
    assert all(ok for ok, _ in results.values())
