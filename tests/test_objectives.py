"""Golden-value tests for every objective, against torch/NumPy oracles that
independently implement the reference math."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest
import torch
import torch.nn.functional as F

from cmlpl_tpu.objectives import (
    adaptive_threshold,
    cps_cross_supervision,
    cross_entropy,
    graph_contrastive,
    memory_smooth,
    nt_xent,
    ohem_cross_entropy,
    pseudo_label_graph,
    queue_init,
    queue_update,
    soft_consistency,
    softmax_js_loss,
    mmd_loss,
    distribution_loss,
    reverse_cross_entropy,
    entropy_filtered_ce,
)


def _np(x):
    return np.asarray(jax.device_get(x))


def test_cross_entropy_matches_torch(rng):
    logits = rng.normal(size=(32, 9)).astype(np.float32)
    labels = rng.integers(0, 9, size=32)
    want = F.cross_entropy(torch.tensor(logits),
                           torch.tensor(labels)).item()
    got = float(cross_entropy(jnp.asarray(logits), jnp.asarray(labels)))
    assert got == pytest.approx(want, rel=1e-5)


def test_memory_smooth_matches_reference_formula(rng):
    # reference train.py:213-215: A = rownorm(exp(f @ Qf.T / T));
    # probs = a*probs + (1-a) A @ Qp
    feats = rng.normal(size=(8, 16)).astype(np.float32)
    probs = rng.dirichlet(np.ones(5), size=8).astype(np.float32)
    qf = rng.normal(size=(20, 16)).astype(np.float32)
    qp = rng.dirichlet(np.ones(5), size=20).astype(np.float32)
    T, a = 0.3, 0.95
    A = np.exp(feats @ qf.T / T)
    A = A / A.sum(1, keepdims=True)
    want = a * probs + (1 - a) * A @ qp

    queue = queue_init(20, 16, 5)
    queue = queue._replace(feats=jnp.asarray(qf), probs=jnp.asarray(qp))
    got = _np(memory_smooth(jnp.asarray(feats), jnp.asarray(probs), queue,
                            a, T))
    # float32 softmax vs float64 exp/rownorm oracle
    np.testing.assert_allclose(got, want, rtol=1e-2, atol=3e-4)


def test_queue_fifo_wraps(rng):
    q = queue_init(10, 4, 3)
    f1 = rng.normal(size=(6, 4)).astype(np.float32)
    p1 = rng.normal(size=(6, 3)).astype(np.float32)
    q = queue_update(q, jnp.asarray(f1), jnp.asarray(p1))
    assert int(q.ptr) == 6
    np.testing.assert_allclose(_np(q.feats)[:6], f1, rtol=1e-6)
    f2 = rng.normal(size=(6, 4)).astype(np.float32)
    p2 = rng.normal(size=(6, 3)).astype(np.float32)
    q = queue_update(q, jnp.asarray(f2), jnp.asarray(p2))
    assert int(q.ptr) == 2
    # rows 6..9 then wrap to 0..1
    np.testing.assert_allclose(_np(q.feats)[6:], f2[:4], rtol=1e-6)
    np.testing.assert_allclose(_np(q.feats)[:2], f2[4:], rtol=1e-6)
    np.testing.assert_allclose(_np(q.feats)[2:6], f1[2:], rtol=1e-6)


def test_adaptive_threshold():
    # reference train.py:147-148: thr * exp(-0.5 (epoch/E)^2)
    for e in [0, 5, 19]:
        want = 1.0 * np.exp(-0.5 * (e / 20) ** 2)
        got = float(adaptive_threshold(jnp.float32(e), 20, 1.0))
        assert got == pytest.approx(want, rel=1e-5)


def test_soft_consistency_matches_reference(rng):
    logits = rng.normal(size=(16, 9)).astype(np.float32)
    probs = rng.dirichlet(np.ones(9), size=16).astype(np.float32)
    mask = (rng.random(16) > 0.4).astype(np.float32)
    lt, pt, mt = map(torch.tensor, (logits, probs, mask))
    want = ((-(F.log_softmax(lt, dim=1) * pt).sum(1) * mt).mean()).item()
    got = float(soft_consistency(jnp.asarray(logits), jnp.asarray(probs),
                                 jnp.asarray(mask)))
    assert got == pytest.approx(want, rel=1e-5)


def _graph_oracle(probs1, probs):
    """train.py:249-256 in torch."""
    q0 = torch.mm(torch.tensor(probs1), torch.tensor(probs).t())
    q0.fill_diagonal_(1)
    pos = (q0 >= 0.8).float()
    q = q0 * pos
    q = q / q.sum(1, keepdim=True)
    neg = (q0 <= 0.3).float()
    qn = (1 - q0) * neg
    qn = qn / (qn.sum(1, keepdim=True) + 1e-8)
    return q.numpy(), qn.numpy()


def test_pseudo_label_graph_matches_reference(rng):
    probs = rng.dirichlet(np.ones(9) * 0.3, size=12).astype(np.float32)
    probs1 = rng.dirichlet(np.ones(9) * 0.3, size=12).astype(np.float32)
    want_q, want_qn = _graph_oracle(probs1, probs)
    q, qn = pseudo_label_graph(jnp.asarray(probs1), jnp.asarray(probs))
    np.testing.assert_allclose(_np(q), want_q, rtol=1e-4, atol=1e-6)
    np.testing.assert_allclose(_np(qn), want_qn, rtol=1e-4, atol=1e-6)


def test_graph_contrastive_matches_reference(rng):
    # train.py:246-265 for net B (E side detached)
    xs = rng.normal(size=(12, 16)).astype(np.float32)
    xw = rng.normal(size=(12, 16)).astype(np.float32)
    xs /= np.linalg.norm(xs, axis=1, keepdims=True)
    xw /= np.linalg.norm(xw, axis=1, keepdims=True)
    probs = rng.dirichlet(np.ones(9) * 0.3, size=12).astype(np.float32)
    probs1 = rng.dirichlet(np.ones(9) * 0.3, size=12).astype(np.float32)
    q_np, qn_np = _graph_oracle(probs1, probs)

    T = 0.3
    sim = torch.exp(torch.mm(torch.tensor(xs), torch.tensor(xw).t()) / T)
    sim_probs = sim / sim.sum(1, keepdim=True)
    want = ((-(torch.log(sim_probs) * torch.tensor(q_np)).sum(1)).mean()
            + ((torch.log(sim_probs + 1) * torch.tensor(qn_np)).sum(1))
            .mean()).item()

    got = float(graph_contrastive(
        jnp.asarray(xs), jnp.asarray(xw), jnp.asarray(q_np),
        jnp.asarray(qn_np), T))
    assert got == pytest.approx(want, rel=1e-4)


def test_softmax_js_loss_matches_torch(rng):
    logits = rng.normal(size=(10, 9)).astype(np.float32)
    targets = rng.dirichlet(np.ones(9), size=10).astype(np.float32)
    lt = torch.tensor(logits)
    tt = torch.tensor(targets)
    eps = 1e-5
    m = (F.softmax(lt, dim=1) + tt) * 0.5
    kl1 = F.kl_div(F.log_softmax(lt, dim=1), m, reduction="mean")
    kl2 = F.kl_div(torch.log(tt + eps), m, reduction="mean")
    want = ((kl1 + kl2) * 0.5).item()
    got = float(softmax_js_loss(jnp.asarray(logits), jnp.asarray(targets)))
    assert got == pytest.approx(want, rel=1e-4)


def test_cps_cross_supervision_matches_torch(rng):
    a = rng.normal(size=(20, 9)).astype(np.float32)
    b = rng.normal(size=(20, 9)).astype(np.float32)
    want = F.cross_entropy(torch.tensor(a),
                           torch.tensor(b).argmax(1)).item()
    got = float(cps_cross_supervision(jnp.asarray(a), jnp.asarray(b)))
    assert got == pytest.approx(want, rel=1e-5)


def test_nt_xent_matches_reference(rng):
    # reference ContrastiveLoss (models.py:14-39)
    bi = rng.normal(size=(6, 8)).astype(np.float32)
    bj = rng.normal(size=(6, 8)).astype(np.float32)
    zi = F.normalize(torch.tensor(bi), dim=1)
    zj = F.normalize(torch.tensor(bj), dim=1)
    reps = torch.cat([zi, zj], dim=0)
    sim = F.cosine_similarity(reps.unsqueeze(1), reps.unsqueeze(0), dim=2)
    pos = torch.cat([torch.diag(sim, 6), torch.diag(sim, -6)])
    nom = torch.exp(pos / 0.5)
    neg_mask = (~torch.eye(12, 12, dtype=bool)).float()
    den = (neg_mask * torch.exp(sim / 0.5)).sum(1)
    want = (-torch.log(nom / den)).sum().item() / 12
    got = float(nt_xent(jnp.asarray(bi), jnp.asarray(bj), 0.5))
    assert got == pytest.approx(want, rel=1e-4)


def test_ohem_keeps_hard_examples(rng):
    logits = rng.normal(size=(64, 9)).astype(np.float32) * 3
    labels = rng.integers(0, 9, size=64)
    full = float(cross_entropy(jnp.asarray(logits), jnp.asarray(labels)))
    hard = float(ohem_cross_entropy(jnp.asarray(logits),
                                    jnp.asarray(labels), thresh=0.7,
                                    min_kept=8))
    assert hard >= full  # mining keeps the hardest examples


def test_rce_finite_and_positive(rng):
    logits = rng.normal(size=(16, 9)).astype(np.float32)
    labels = rng.integers(0, 9, size=16)
    v = float(reverse_cross_entropy(jnp.asarray(logits),
                                    jnp.asarray(labels), 9))
    assert np.isfinite(v) and v > 0


def test_entropy_filtered_ce_drops_high_entropy(rng):
    logits = rng.normal(size=(32, 9)).astype(np.float32)
    teacher = rng.normal(size=(32, 9)).astype(np.float32) * 2
    labels = rng.integers(0, 9, size=32)
    v = float(entropy_filtered_ce(jnp.asarray(logits), jnp.asarray(labels),
                                  jnp.asarray(teacher), percent=80.0))
    assert np.isfinite(v)


def test_mmd_separates_distributions(rng):
    x = rng.normal(size=(64, 8)).astype(np.float32)
    y_same = rng.normal(size=(64, 8)).astype(np.float32)
    y_diff = rng.normal(3.0, 1.0, size=(64, 8)).astype(np.float32)
    same = float(mmd_loss(jnp.asarray(x), jnp.asarray(y_same)))
    diff = float(mmd_loss(jnp.asarray(x), jnp.asarray(y_diff)))
    assert diff > same


def test_distribution_loss_menu(rng):
    x = jnp.asarray(rng.normal(size=(8, 4)).astype(np.float32))
    y = jnp.asarray(rng.normal(size=(8, 4)).astype(np.float32))
    for kind in ["mmd", "mse", "kl", "cosine"]:
        assert np.isfinite(float(distribution_loss(x, y, kind)))
    with pytest.raises(ValueError):
        distribution_loss(x, y, "nope")
