"""Latent-tail DDPM sampling: run the reverse loop in hidden space.

The flagship denoiser (networks.DiffusionDenoiser) touches data space
only through affine maps — ``input_proj`` on the way in, ``output_proj``
and the scalar time-gain skip on the way out — and the x0-param DDPM
posterior update is itself affine in (x_t, x0_pred, z):

    x0_hat   = out + g_t * x            (out = K_out h + b_out)
    x_{t-1}  = c0_t clip(x0_hat) + c1_t x + sv_t z

Whenever the clip is not binding, one reverse step is therefore a
LINEAR map of the data-space state plus per-step injections, and the
whole loop can run in the ``hidden_dims[0]``-dim latent s = x @ K_in:

    s_{t-1} = A_t s + c0_t (h_t M2 + m_b) + sv_t (L zeta_t)

with A_t = c1_t + c0_t g_t, M2 = K_out K_in, m_b = b_out K_in, and
zeta_t a unit-variance 256-dim draw standing in for the projection of
the data-space transition noise (K_in^T z ~ N(0, G), G = K_in^T K_in,
L = chol(G)). The wide matmuls and the D-dim noise draw disappear from
the per-step cost: at the production dims (D = 5142, hidden 256/512)
the per-step MACs drop ~3.5x (5.19M -> 1.49M per patient).

The data-space cohort is reconstructed ONCE at the end. Every step's
contribution to x_1 is linear, so the loop only accumulates
H_acc = sum_t w_t h_t (hidden-width) and xi = sum_t v_t zeta_t with
host-precomputed suffix-product weights, and

    x_1 = c_x x_head + H_acc K_out + c_beta b_out
          + xi C^T + sqrt(v2) (eta - (eta K_in) R)

where the last two terms construct data-space transition noise that is
EXACTLY consistent with what the hidden path saw: defining
z_t := C zeta_t + r_t with C = K_in G^{-1} L and r_t ~ N(0, I - P),
P = K_in G^{-1} K_in^T, gives K_in^T z_t = L zeta_t (the hidden
injection) and Cov(z_t) = P + (I - P) = I. The output distribution is
identical to the data-space sampler's (the per-step uniform-vs-Gaussian
noise shape was already accepted as CLT-washed by the fused kernel,
ops/fused_sampler.py prng_uniform_wide).

The clip is handled by a HYBRID: the first ``head_steps`` reverse steps
(high noise, where an x0-param model's prediction can still stray
toward the +-30 rail) run in data space; `calibrate_head_steps` probes
a real trajectory and picks the switch point with margin. The final
t=0 step is always materialized in data space, so its clip is exact.

Scope mirrors the fused kernel's flagship slice minus the discrete
head (phase 1): x0 parameterization, input-skip gain, no learned or
low-rank sigma, no classifier-free guidance, no D3PM mutation block.

Reference counterpart: none — the reference's reverse loop launches
the full-width denoiser from the host every step (reference
models/diffusion.py:446-447); this module is a TPU-first restructuring
of that loop's algebra.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

_UNIFORM_SCALE = float(2.0 * np.sqrt(3.0))  # U(-sqrt3, sqrt3), unit var


def supports_latent(model) -> bool:
    """The architecture/config slice the latent-tail path implements."""
    d = model.denoiser
    return (
        model.parameterization == "x0"
        and not model.learn_sigma
        and getattr(model, "low_rank_sigma_dim", 0) == 0
        and d.input_skip
        and model.clip_denoised
        and not (model.discrete_head and model.mutation_dim)
    )


def _sinusoid(t_norm: np.ndarray, dim: int) -> np.ndarray:
    """TimeEmbedding parity (networks.py TimeEmbedding)."""
    half = dim // 2
    freqs = np.exp(np.arange(half) * (-np.log(10000.0) / (half - 1)))
    args = t_norm[:, None] * freqs[None, :]
    return np.concatenate([np.sin(args), np.cos(args)], axis=-1).astype(
        np.float32
    )


class LatentTailSampler:
    """Host-precomputes the latent algebra once per (model, params);
    `sample` runs the hybrid head + latent-tail loop as XLA scans (the
    portable reference; the Pallas kernel variant builds on the same
    tables). Construct OUTSIDE jit — concrete params required."""

    def __init__(self, model, params, head_steps: int = 1):
        if not supports_latent(model):
            raise ValueError(
                "model configuration not supported by the latent-tail "
                "sampler; use model.sample or the fused kernel"
            )
        self.model = model
        self.params = params
        d = model.denoiser
        self.data_dim = d.data_dim
        sched = model.schedule
        self.T = int(sched.num_steps)
        if not 1 <= head_steps <= self.T - 1:
            raise ValueError(
                f"head_steps must be in [1, {self.T - 1}], got {head_steps}"
            )
        self.head_steps = int(head_steps)
        self.clip_value = float(model.denoised_clip_value)
        self.noise_type = model.noise_type

        p = jax.tree_util.tree_map(
            lambda a: np.asarray(a, np.float64), params
        )

        # --- per-row tables, reverse-time order (row T-1 = t=0) ------
        ts = np.arange(self.T - 1, -1, -1)
        t_norm = ts.astype(np.float64) / self.T
        sin = _sinusoid(t_norm, d.time_dim).astype(np.float64)
        t_emb = sin @ p["time_proj"]["kernel"] + p["time_proj"]["bias"]
        gains = (sin @ p["skip_gain"]["kernel"] + p["skip_gain"]["bias"])[
            :, 0
        ]
        # Includes the input-proj bias (parity: fused_sampler.t_add).
        self.t_add = jnp.asarray(
            t_emb + p["input_proj"]["bias"], jnp.float32
        )
        c0 = np.asarray(sched.posterior_coef_x0, np.float64)[ts].copy()
        c1 = np.asarray(sched.posterior_coef_xt, np.float64)[ts].copy()
        sv = np.sqrt(np.asarray(sched.posterior_variance, np.float64))[
            ts
        ].copy()
        # Final row (t=0): x0 = clip(out + g x), no posterior mix, no
        # noise (models/diffusion.py sample, final step).
        c0[-1], c1[-1], sv[-1] = 1.0, 0.0, 0.0
        self.c0, self.c1, self.sv, self.gains = c0, c1, sv, gains
        self.gains_f32 = jnp.asarray(gains, jnp.float32)
        self.c0_f32 = jnp.asarray(c0, jnp.float32)
        self.c1_f32 = jnp.asarray(c1, jnp.float32)
        self.sv_f32 = jnp.asarray(sv, jnp.float32)

        # --- latent algebra ------------------------------------------
        K_in = p["input_proj"]["kernel"]  # (D, H0)
        K_out = p["output_proj"]["kernel"]  # (H_last, D)
        b_out = p["output_proj"]["bias"]  # (D,)
        G = K_in.T @ K_in  # (H0, H0)
        # Tiny jitter: K_in is lecun-normal (D >> H0) so G is far from
        # singular; the jitter only guards a pathological checkpoint.
        L = np.linalg.cholesky(G + 1e-9 * np.eye(G.shape[0]))
        Ginv_KinT = np.linalg.solve(G, K_in.T)  # R: (H0, D)
        C = K_in @ np.linalg.solve(G, L)  # (D, H0)
        self.K_in = jnp.asarray(K_in, jnp.float32)
        self.K_out = jnp.asarray(K_out, jnp.float32)
        self.b_out = jnp.asarray(b_out, jnp.float32)
        self.L_T = jnp.asarray(L.T, jnp.float32)  # apply as zeta @ L^T
        self.C_T = jnp.asarray(C.T, jnp.float32)  # apply as xi @ C^T
        self.R = jnp.asarray(Ginv_KinT, jnp.float32)
        self.M2 = jnp.asarray(K_out @ K_in, jnp.float32)  # (H_last, H0)
        self.m_b = jnp.asarray(b_out @ K_in, jnp.float32)  # (H0,)
        self._fns = {}
        self._set_segment(self.head_steps)

    # ------------------------------------------------------------------
    def _set_segment(self, head_steps: int) -> None:
        """Latent-segment scalar tables for a head length: rows
        [head_steps, T-2] run latent; suffix products of A give each
        row's weight in the final x_1 reconstruction."""
        T = self.T
        rows = np.arange(head_steps, T - 1)
        A = self.c1[rows] + self.c0[rows] * self.gains[rows]
        # P[k] = prod of A over rows AFTER k within the segment.
        P = np.concatenate(
            [np.cumprod(A[::-1])[::-1][1:], np.array([1.0])]
        ) if len(rows) else np.zeros((0,))
        self.seg_rows = rows
        self.A = jnp.asarray(A, jnp.float32)
        self.w = jnp.asarray(self.c0[rows] * P, jnp.float32)
        self.v = jnp.asarray(self.sv[rows] * P, jnp.float32)
        self.seg_sv = jnp.asarray(self.sv[rows], jnp.float32)
        self.seg_c0 = jnp.asarray(self.c0[rows], jnp.float32)
        self.c_x = float(np.prod(A)) if len(rows) else 1.0
        self.c_beta = float(np.sum(self.c0[rows] * P))
        self.v2 = float(np.sum((self.sv[rows] * P) ** 2))

    # ------------------------------------------------------------------
    def _hidden(self, h_in: jnp.ndarray) -> jnp.ndarray:
        d = self.model.denoiser
        return d.apply(
            {"params": self.params}, h_in, True,
            method=type(d).hidden_forward,
        )

    def _c_proj(self, conditions: jnp.ndarray) -> jnp.ndarray:
        d = self.model.denoiser
        return d.apply(
            {"params": self.params}, conditions,
            method=type(d).embed_conditions,
        ).astype(jnp.float32)

    def _step_noise(self, key, shape):
        if self.noise_type == "uniform":
            u = jax.random.uniform(key, shape, jnp.float32)
            return (u - 0.5) * _UNIFORM_SCALE
        return jax.random.normal(key, shape, jnp.float32)

    # ------------------------------------------------------------------
    def sample(
        self,
        conditions: jnp.ndarray,
        rng: jax.Array,
        num_samples: Optional[int] = None,
        noise: Optional[jnp.ndarray] = None,
    ) -> jnp.ndarray:
        """Hybrid head + latent-tail reverse loop (XLA reference path).

        `noise`: optional (T, B, D) per-row transition noise for
        exactness tests (replaces every random draw downstream of x_T;
        the latent segment consumes each row through its K_in
        projection and reconstructs with the accumulated wide sum, so
        the output matches the data-space loop bit-for-bit up to f32
        association error)."""
        if num_samples is None:
            num_samples = conditions.shape[0]
        n_head, T, D = self.head_steps, self.T, self.data_dim
        c_proj = self._c_proj(conditions)
        init_rng, head_rng, lat_rng, eta_rng = jax.random.split(rng, 4)
        x = jax.random.normal(init_rng, (num_samples, D), jnp.float32)

        test_mode = noise is not None
        if test_mode:
            assert noise.shape == (T, num_samples, D), noise.shape
            noise = noise.astype(jnp.float32)

        def data_step(x, row):
            """One full-width reverse step (rows 0..T-2)."""
            h_in = x @ self.K_in + self.t_add[row] + c_proj
            h = self._hidden(h_in)
            out = h @ self.K_out + self.b_out + self.gains_f32[row] * x
            x0 = jnp.clip(out, -self.clip_value, self.clip_value)
            if test_mode:
                z = noise[row]
            else:
                z = self._step_noise(
                    jax.random.fold_in(head_rng, row), x.shape
                )
            return (
                self.c0_f32[row] * x0
                + self.c1_f32[row] * x
                + self.sv_f32[row] * z
            )

        # --- data-space head ------------------------------------------
        x, _ = jax.lax.scan(
            lambda xc, r: (data_step(xc, r), None),
            x,
            jnp.arange(n_head),
        )

        n_lat = T - 1 - n_head
        if n_lat > 0:
            # --- latent tail ------------------------------------------
            H_last = self.K_out.shape[0]
            H0 = self.K_in.shape[1]
            s0 = x @ self.K_in
            H_acc0 = jnp.zeros((num_samples, H_last), jnp.float32)
            xi0 = jnp.zeros((num_samples, H0), jnp.float32)
            if test_mode:
                Z_acc0 = jnp.zeros((num_samples, D), jnp.float32)

            def latent_step(carry, k):
                row = n_head + k
                if test_mode:
                    s, H_acc, Z_acc = carry
                else:
                    s, H_acc, xi = carry
                h = self._hidden(s + self.t_add[row] + c_proj)
                o_lat = h @ self.M2 + self.m_b
                if test_mode:
                    n_lat_inj = noise[row] @ self.K_in
                    Z_acc = Z_acc + self.v[k] * noise[row]
                else:
                    zeta = self._step_noise(
                        jax.random.fold_in(lat_rng, row), (s.shape[0], H0)
                    )
                    n_lat_inj = zeta @ self.L_T
                    xi = xi + self.v[k] * zeta
                s = (
                    self.A[k] * s
                    + self.seg_c0[k] * o_lat
                    + self.seg_sv[k] * n_lat_inj
                )
                H_acc = H_acc + self.w[k] * h
                if test_mode:
                    return (s, H_acc, Z_acc), None
                return (s, H_acc, xi), None

            init = (s0, H_acc0, Z_acc0 if test_mode else xi0)
            (s1, H_acc, tail), _ = jax.lax.scan(
                latent_step, init, jnp.arange(n_lat)
            )

            # --- one-time wide reconstruction of x_1 ------------------
            x1 = (
                self.c_x * x
                + H_acc @ self.K_out
                + self.c_beta * self.b_out
            )
            if test_mode:
                x1 = x1 + tail  # the exact accumulated wide noise
            else:
                xi = tail
                eta = jax.random.normal(
                    eta_rng, (num_samples, D), jnp.float32
                )
                resid = eta - (eta @ self.K_in) @ self.R
                x1 = x1 + xi @ self.C_T + np.sqrt(self.v2) * resid
            # Final t=0 denoise uses the latent state (h path) and the
            # materialized x_1 (gain path).
            h0 = self._hidden(s1 + self.t_add[T - 1] + c_proj)
            out0 = (
                h0 @ self.K_out + self.b_out + self.gains_f32[T - 1] * x1
            )
        else:
            # Pure data-space fallback (head covers every loop row).
            h_in = x @ self.K_in + self.t_add[T - 1] + c_proj
            h0 = self._hidden(h_in)
            out0 = (
                h0 @ self.K_out + self.b_out + self.gains_f32[T - 1] * x
            )
        return jnp.clip(out0, -self.clip_value, self.clip_value)


# ----------------------------------------------------------------------
def calibrate_head_steps(
    model,
    params,
    conditions: jnp.ndarray,
    rng: jax.Array,
    margin: float = 0.5,
    min_head: int = 1,
) -> Tuple[int, np.ndarray]:
    """Probe a data-space trajectory for x0-clip headroom and pick the
    latent switch point.

    Runs the full-width reverse loop once on `conditions` (keep the
    probe cohort small — a few hundred rows bounds the tail estimate
    well) recording each row's max |x0_pred| BEFORE the clip. A row is
    unsafe if that max exceeds ``margin * clip_value``; the head must
    cover every unsafe row, so the returned head length is
    (last unsafe row + 1), floored at ``min_head``. Returns
    (head_steps, per-row max profile) — callers should persist the
    choice per checkpoint rather than re-probing every cohort."""
    sampler = LatentTailSampler(model, params, head_steps=1)
    T, D = sampler.T, sampler.data_dim
    c_proj = sampler._c_proj(conditions)
    init_rng, head_rng = jax.random.split(rng)
    x = jax.random.normal(init_rng, (conditions.shape[0], D), jnp.float32)

    def step(x, row):
        h_in = x @ sampler.K_in + sampler.t_add[row] + c_proj
        h = sampler._hidden(h_in)
        out = (
            h @ sampler.K_out
            + sampler.b_out
            + sampler.gains_f32[row] * x
        )
        peak = jnp.max(jnp.abs(out))
        x0 = jnp.clip(out, -sampler.clip_value, sampler.clip_value)
        z = sampler._step_noise(jax.random.fold_in(head_rng, row), x.shape)
        x_next = (
            sampler.c0_f32[row] * x0
            + sampler.c1_f32[row] * x
            + sampler.sv_f32[row] * z
        )
        return x_next, peak

    _, peaks = jax.lax.scan(step, x, jnp.arange(T))
    profile = np.asarray(peaks)
    threshold = margin * sampler.clip_value
    # Rows 0..T-2 are loop rows; the final row's clip is always exact
    # (materialized in data space), so it never forces head coverage.
    unsafe = np.nonzero(profile[: T - 1] > threshold)[0]
    head = int(unsafe[-1]) + 1 if unsafe.size else min_head
    return max(head, min_head), profile
