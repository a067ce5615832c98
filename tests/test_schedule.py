"""ReduceLROnPlateau parity with torch semantics (mode='max')."""

import numpy as np
import pytest

from pose6d_tpu.train.schedule import ReduceLROnPlateau


def test_reduces_after_patience():
    s = ReduceLROnPlateau(lr=1e-4, patience=5, factor=0.5)
    s.step(10.0)  # best = 10
    for i in range(5):
        lr = s.step(9.0)
        assert lr == 1e-4  # within patience
    lr = s.step(9.0)  # 6th bad epoch > patience
    assert lr == 5e-5


def test_improvement_resets_counter():
    s = ReduceLROnPlateau(lr=1e-4, patience=2, factor=0.5)
    s.step(10.0)
    s.step(9.0)
    s.step(9.0)
    s.step(11.0)  # improvement resets
    s.step(10.0)
    s.step(10.0)
    lr = s.step(10.0)  # 3rd bad epoch > patience=2
    assert lr == 5e-5


def test_relative_threshold():
    # improvement below best*(1+1e-4) does NOT count (torch rel mode)
    s = ReduceLROnPlateau(lr=1.0, patience=0, factor=0.5)
    s.step(100.0)
    lr = s.step(100.005)  # < 100 * 1.0001 = 100.01 -> bad epoch
    assert lr == 0.5
    s2 = ReduceLROnPlateau(lr=1.0, patience=0, factor=0.5)
    s2.step(100.0)
    lr = s2.step(100.02)  # > 100.01 -> improvement
    assert lr == 1.0


def test_min_lr_floor():
    s = ReduceLROnPlateau(lr=1e-6, patience=0, factor=0.5, min_lr=1e-7)
    s.step(1.0)
    for _ in range(10):
        lr = s.step(0.0)
    assert lr == pytest.approx(1e-7)


def test_state_round_trip():
    s = ReduceLROnPlateau(lr=1e-4, patience=3)
    s.step(5.0)
    s.step(4.0)
    d = s.state_dict()
    s2 = ReduceLROnPlateau(lr=0.0, patience=3)
    s2.load_state_dict(d)
    assert s2.lr == s.lr and s2.best == s.best and s2.num_bad_epochs == s.num_bad_epochs


@pytest.mark.skipif(
    pytest.importorskip("torch", reason="torch absent") is None, reason="torch absent"
)
def test_parity_with_torch_scheduler():
    import torch

    metrics = [1.0, 2.0, 1.9, 1.95, 2.0, 2.0, 1.99, 1.5, 3.0, 2.9, 2.8, 2.7, 2.6, 2.5, 2.4, 2.3]
    p = torch.nn.Parameter(torch.zeros(1))
    opt = torch.optim.SGD([p], lr=1e-4)
    tsched = torch.optim.lr_scheduler.ReduceLROnPlateau(
        opt, mode="max", factor=0.5, patience=2, min_lr=1e-7
    )
    ours = ReduceLROnPlateau(lr=1e-4, factor=0.5, patience=2, min_lr=1e-7)
    for m in metrics:
        tsched.step(m)
        lr_ours = ours.step(m)
        lr_torch = opt.param_groups[0]["lr"]
        np.testing.assert_allclose(lr_ours, lr_torch, rtol=1e-9, err_msg=f"metric {m}")


@pytest.mark.skipif(
    pytest.importorskip("torch", reason="torch absent") is None, reason="torch absent"
)
def test_parity_with_torch_scheduler_negative_metrics():
    # rel-threshold formula must match torch for negative best values too
    # (torch uses best*(1+threshold) in mode=max regardless of sign)
    import torch

    metrics = [-1.0, -0.9, -0.91, -0.905, -0.9, -0.9, -0.9, -0.89, -1.2, -1.3,
               -1.4, -0.5, -0.51, -0.52, -0.53, -0.54]
    p = torch.nn.Parameter(torch.zeros(1))
    opt = torch.optim.SGD([p], lr=1e-4)
    tsched = torch.optim.lr_scheduler.ReduceLROnPlateau(
        opt, mode="max", factor=0.5, patience=2, min_lr=1e-7
    )
    ours = ReduceLROnPlateau(lr=1e-4, factor=0.5, patience=2, min_lr=1e-7)
    for m in metrics:
        tsched.step(m)
        lr_ours = ours.step(m)
        lr_torch = opt.param_groups[0]["lr"]
        np.testing.assert_allclose(lr_ours, lr_torch, rtol=1e-9, err_msg=f"metric {m}")
