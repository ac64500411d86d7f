"""Generator with a device mesh: cohort sharding over the `data` axis."""

import jax
import jax.numpy as jnp
import numpy as np

from osteosarcoma_diffusionmodel_tpu.config import Config
from osteosarcoma_diffusionmodel_tpu.generation.generator import (
    SyntheticPatientGenerator,
)
from osteosarcoma_diffusionmodel_tpu.models.diffusion import ConditionalDiffusion
from osteosarcoma_diffusionmodel_tpu.parallel.mesh import make_mesh


def build(mesh=None):
    cfg = Config()
    cfg.model.hidden_dims = [32, 64, 32]
    cfg.model.latent_dim = 16
    cfg.model.diffusion.num_steps = 6
    cfg.model.compute_dtype = "float32"
    cfg.model.constraints.enabled = False
    dims = cfg.freeze_dims(
        5, 12, 3,
        ["survival_days_norm", "event_occurred", "metastasis_at_diagnosis"],
    )
    model = ConditionalDiffusion.from_config(cfg, dims)
    params = model.init_params(jax.random.PRNGKey(0), dims.condition_dim)
    return SyntheticPatientGenerator(model, params, cfg, dims, mesh=mesh)


def test_sharded_cohort_matches_single_device():
    plain = build(mesh=None)
    sharded = build(mesh=make_mesh(8))
    scenario = {"survival_time": 700, "event_occurred": 1}
    out_a = plain.generate(64, scenario, rng=jax.random.PRNGKey(5))
    out_b = sharded.generate(64, scenario, rng=jax.random.PRNGKey(5))
    # Same keys + same algebra -> same cohorts up to reduction-order
    # float noise accumulated over the reverse steps.
    np.testing.assert_allclose(
        out_a["expression"], out_b["expression"], rtol=1e-3, atol=5e-3
    )
    # Binarization at 0.5 can flip values sitting on the threshold.
    assert (out_a["mutations"] != out_b["mutations"]).mean() < 0.01


def test_sharded_scenarios_loop():
    gen = build(mesh=make_mesh(8))
    results = gen.generate_scenarios(gen.config.generation.scenarios, 16)
    assert len(results) == 3
    for out in results.values():
        assert out["mutations"].shape == (16, 5)
        assert np.all(np.isfinite(out["expression"]))
