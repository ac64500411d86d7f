"""Trainer components: early stopping, plateau LR, mixup, splits.

Parity targets: reference utils/train.py:85-148 (mixup, early stopping),
:176-181 (ReduceLROnPlateau), :412-420 (seeded split).
"""

import jax
import jax.numpy as jnp
import numpy as np

from osteosarcoma_diffusionmodel_tpu.data.dataset import mixup, train_val_split
from osteosarcoma_diffusionmodel_tpu.training.trainer import (
    EarlyStopping,
    PlateauLR,
)


def test_early_stopping_triggers():
    es = EarlyStopping(patience=3, min_delta=0.0)
    for loss in [1.0, 0.9, 0.91, 0.92, 0.93]:
        es(loss)
    assert es.early_stop
    assert es.best_loss == 0.9


def test_early_stopping_resets_on_improvement():
    es = EarlyStopping(patience=2, min_delta=0.0)
    for loss in [1.0, 0.99, 1.01, 0.95, 1.0, 1.01]:
        es(loss)
    assert es.early_stop  # two bad epochs after 0.95
    es2 = EarlyStopping(patience=3)
    for loss in [1.0, 0.9, 0.8, 0.7]:
        es2(loss)
    assert not es2.early_stop


def test_early_stopping_min_delta():
    es = EarlyStopping(patience=2, min_delta=0.1)
    # Improvements smaller than min_delta count as plateau.
    for loss in [1.0, 0.95, 0.92]:
        es(loss)
    assert es.early_stop


def test_plateau_lr_halves_after_patience():
    sched = PlateauLR(base_lr=1.0, factor=0.5, patience=2)
    lrs = []
    for loss in [1.0, 1.0, 1.0, 1.0, 1.0]:
        lrs.append(sched.step(loss))
    # First call sets best; then 3 bad epochs -> reduce once (counter>patience).
    assert lrs[-1] == 0.5
    # Improvement resets.
    sched.step(0.5)
    assert sched.counter == 0


def test_train_val_split_deterministic():
    t1, v1 = train_val_split(100, 0.2, seed=42)
    t2, v2 = train_val_split(100, 0.2, seed=42)
    np.testing.assert_array_equal(t1, t2)
    np.testing.assert_array_equal(v1, v2)
    assert len(v1) == 20 and len(t1) == 80
    assert len(set(t1) & set(v1)) == 0
    t3, _ = train_val_split(100, 0.2, seed=7)
    assert not np.array_equal(t1, t3)


def test_mixup_properties(rng):
    data = jnp.asarray(rng.normal(size=(16, 10)).astype(np.float32))
    cond = jnp.asarray(rng.normal(size=(16, 3)).astype(np.float32))
    surv = jnp.asarray(rng.normal(size=(16,)).astype(np.float32))
    md, mc, ms = mixup(jax.random.PRNGKey(0), data, cond, surv, alpha=0.2)
    assert md.shape == data.shape and mc.shape == cond.shape
    # Convex combination: column means preserved in expectation over the
    # permutation; check that each mixed row lies within the convex hull
    # bounds of the two source rows (min <= mix <= max elementwise is
    # only guaranteed pairwise, so check global bounds).
    assert float(jnp.max(md)) <= float(jnp.max(data)) + 1e-5
    assert float(jnp.min(md)) >= float(jnp.min(data)) - 1e-5
    # Deterministic given key.
    md2, _, _ = mixup(jax.random.PRNGKey(0), data, cond, surv, alpha=0.2)
    np.testing.assert_allclose(np.asarray(md), np.asarray(md2))


def test_mixup_jittable(rng):
    data = jnp.asarray(rng.normal(size=(8, 4)).astype(np.float32))
    cond = jnp.zeros((8, 2))
    surv = jnp.zeros((8,))
    out = jax.jit(lambda k: mixup(k, data, cond, surv, 0.2))(jax.random.PRNGKey(1))
    assert out[0].shape == (8, 4)
