import numpy as np

from neuralnetworklibrary_tpu.core.schedules import (
    cycles_sched,
    get_sched,
    one_cycle_scheds,
)


def test_linear():
    s = get_sched("linear", 5, 0.0, 1.0)
    np.testing.assert_allclose(s, [0, 0.25, 0.5, 0.75, 1.0])


def test_cos_endpoints_and_midpoint():
    s = get_sched("cos", 101, 2.0, 0.5)
    assert np.isclose(s[0], 2.0) and np.isclose(s[-1], 0.5)
    assert np.isclose(s[50], 0.5 + 1.5 * 0.5)  # halfway down the cosine


def test_exp_is_geometric():
    s = get_sched("exp", 4, 1e-4, 1e-1)
    ratios = s[1:] / s[:-1]
    np.testing.assert_allclose(ratios, ratios[0])
    assert np.isclose(s[0], 1e-4) and np.isclose(s[-1], 1e-1)


def test_poly_endpoints():
    s = get_sched("poly", 10, 1.0, 0.01)
    assert np.isclose(s[0], 1.0) and np.isclose(s[-1], 0.01)


def test_vector_start_end():
    # per-layer-group differential lrs: start/end are length-3 vectors
    s = get_sched("linear", 4, [0.0, 0.0, 0.0], [3.0, 6.0, 9.0])
    assert s.shape == (4, 3)
    np.testing.assert_allclose(s[-1], [3.0, 6.0, 9.0])
    np.testing.assert_allclose(s[1], [1.0, 2.0, 3.0])

    c = get_sched("cos", 5, [1.0, 2.0], [0.0, 0.0])
    assert c.shape == (5, 2)
    np.testing.assert_allclose(c[0], [1.0, 2.0])
    np.testing.assert_allclose(c[-1], [0.0, 0.0], atol=1e-12)


def test_one_cycle_shapes_and_phases():
    # Learner.fit_one_cycle: N1 = int(N*start_pct) linear up, N2 cos down to lr_min/1e4
    sched = one_cycle_scheds(100, lr_max=0.01, div_fac=25, start_pct=0.3)
    lr, mom = sched["lr"], sched["mom"]
    assert len(lr) == 100
    N1 = 30
    assert np.isclose(lr[0], 0.01 / 25)
    assert np.isclose(lr[N1 - 1], 0.01)
    assert np.isclose(lr[-1], 0.01 / 25 / 1e4)
    assert np.isclose(mom[0], 0.95) and np.isclose(mom[N1 - 1], 0.85)
    assert np.isclose(mom[-1], 0.95)
    assert np.argmax(lr) == N1 - 1


def test_cycles_sched_restarts():
    s = cycles_sched(10, 1.0, 0.1, num_cycles=3, cycle_type="cos", base_length=1, cycle_mult=2)
    # lengths: 10, 20, 40
    assert len(s) == 70
    assert np.isclose(s[0], 1.0) and np.isclose(s[9], 0.1)
    assert np.isclose(s[10], 1.0)  # restart
    assert np.isclose(s[29], 0.1) and np.isclose(s[30], 1.0)
