"""K-estimator semantics tests (reference: src/compression/parameter_selection.rs tests)."""

import pytest

from felics_tpu.coding.rice import rice_code_length
from felics_tpu.core.kestimator import KEstimator


def test_context_map_contents():
    k_values = [0, 1, 2, 4, 8, 16]
    est = KEstimator(300, k_values, None)
    updates = {
        100: [4, 8, 13, 45, 85],
        80: [7, 800, 1000, 1273, 85],
        75: [7, 13, 1000, 200, 85],
        255: [1, 4, 142, 563, 1246, 2464],
        0: [0, 100, 3],
    }
    for context, values in updates.items():
        for v in values:
            est.update(context, v)
    for context, values in updates.items():
        for i, k in enumerate(k_values):
            expected = sum(rice_code_length(v, k) for v in values)
            assert est.table[context][i] == expected


def test_get_k():
    k_values = [0, 1, 2, 4, 5, 16]
    est = KEstimator(400, k_values, None)
    for v in (10, 40, 5):
        est.update(100, v)
    assert est.get_k(100) == 4
    for v in (1000, 200, 1250, 300):
        est.update(255, v)
    assert est.get_k(255) == 16


def test_ties_pick_largest_k():
    # All-zero initial table: every k ties at 0 -> the largest k wins
    # (reference scans ascending with '<=', parameter_selection.rs:71-85).
    est = KEstimator(10, [0, 1, 2, 3], None)
    assert est.get_k(5) == 3


def test_empty_k_values():
    with pytest.raises(ValueError):
        KEstimator(100, [], None)


def test_periodic_count_scaling():
    # Hand-computed trace from parameter_selection.rs:155-183.
    est = KEstimator(120, [0, 1, 2], 1024)
    context = 43
    for v in (400, 531, 2000, 1733):
        est.update(context, v)
    assert list(est.table[context]) == [2334, 1169, 588]


def test_halving_strictly_greater():
    # Halving triggers only when min > threshold, not ==.
    est = KEstimator(5, [0], 10)
    est.update(0, 9)  # row = [10] == threshold -> no halving
    assert est.table[0][0] == 10
    est.update(0, 0)  # row = [11] > threshold -> halve to 5
    assert est.table[0][0] == 5
