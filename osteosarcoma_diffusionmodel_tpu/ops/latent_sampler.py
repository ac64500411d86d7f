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
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .fused_sampler import NUM_GROUPS

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
# Pallas latent-tail kernel
# ----------------------------------------------------------------------
def _build_latent_kernel(layout, n_lat, tile_b, noise_mode, gn_mode):
    """Whole-latent-segment kernel: per batch tile, the hidden-width
    state, both reconstruction accumulators and every block weight stay
    VMEM-resident for all steps. Same structural conventions as
    ops/fused_sampler._build_kernel minus the wide projections: the
    input projection becomes the A_t/s recursion, the output projection
    becomes the (H_last, H0) M2 = K_out K_in product, and the D-dim
    transition noise becomes a hidden-width draw recolored by chol(G).
    """
    from .fused_sampler import _groupnorm

    n_enc = layout["n_encoder"]

    def kernel(*refs):
        seed_ref, coeff_ref, s_ref, cproj_ref, tadd_ref = refs[:5]
        idx = 5
        block_entries = []
        for _kind, n_parts, _feat in layout["blocks"]:
            parts = list(refs[idx : idx + n_parts])
            fc2 = refs[idx + n_parts]
            vecs = refs[idx + n_parts + 1 : idx + n_parts + 7]
            idx += n_parts + 7
            block_entries.append((parts, fc2, vecs))
        m2_ref, mb_ref, lt_ref = refs[idx : idx + 3]
        idx += 3
        gmat_refs = refs[idx : idx + 2 * len(layout["gn_features"])]
        idx += 2 * len(layout["gn_features"])
        zeta_ref = refs[idx] if noise_mode == "buffer" else None
        hacc_ref, xi_ref, h0_ref = refs[-3:]

        gn_table = {}
        for k, feat in enumerate(layout["gn_features"]):
            gn_table[feat] = (gmat_refs[2 * k], gmat_refs[2 * k + 1])

        if noise_mode == "prng":
            pltpu.prng_seed(seed_ref[0, 0], pl.program_id(0))

        cproj = cproj_ref[:].astype(jnp.float32)
        H0 = s_ref.shape[1]

        def dot(a, w_ref):
            return jnp.dot(
                a.astype(jnp.bfloat16), w_ref[:],
                preferred_element_type=jnp.float32,
            )

        def hidden(h):
            """enc/bottleneck/dec stack, (tile, H0) -> (tile, H_last);
            mirrors fused_sampler's stage bodies (decoder concat as a
            sum of split-row matmuls)."""
            skips = []
            for k, (_kind, _n, feat) in enumerate(layout["blocks"]):
                parts_e, fc2_e, vecs = block_entries[k]
                inputs = [h]
                if k > n_enc:
                    inputs.append(skips.pop())
                acc = None
                for part, e in zip(inputs, parts_e):
                    term = dot(part, e)
                    acc = term if acc is None else acc + term
                g, gt = gn_table[feat]
                h = jax.nn.silu(_groupnorm(
                    acc + vecs[0][:], g[:], gt[:], vecs[1][:], vecs[2][:],
                    feat // NUM_GROUPS, gn_mode,
                ))
                h = dot(h, fc2_e) + vecs[3][:]
                h = jax.nn.silu(_groupnorm(
                    h, g[:], gt[:], vecs[4][:], vecs[5][:],
                    feat // NUM_GROUPS, gn_mode,
                ))
                if k < n_enc:
                    skips.append(h)
            return h

        def t_row(k):
            onehot = (
                jax.lax.broadcasted_iota(jnp.int32, (1, n_lat + 1), 1)
                == k
            ).astype(jnp.float32)
            return jnp.dot(
                onehot, tadd_ref[:], preferred_element_type=jnp.float32
            )

        def zeta_draw(k):
            if noise_mode == "buffer":
                return zeta_ref[k].astype(jnp.float32)
            half = H0 // 2
            bits = pltpu.bitcast(
                pltpu.prng_random_bits((tile_b, half)), jnp.uint32
            )
            lo = pltpu.bitcast(bits & 0xFFFF, jnp.int32)
            hi = pltpu.bitcast(bits >> 16, jnp.int32)
            u = jnp.concatenate(
                [lo.astype(jnp.float32), hi.astype(jnp.float32)], axis=1
            ) * (1.0 / (1 << 16))
            return (u - 0.5) * _UNIFORM_SCALE

        def body(k, carry):
            s, hacc, xi = carry
            h = hidden(s + t_row(k) + cproj)
            o_lat = dot(h, m2_ref) + mb_ref[:]
            z = zeta_draw(k)
            n_inj = dot(z, lt_ref)
            A = coeff_ref[k, 0]
            c0 = coeff_ref[k, 1]
            sv = coeff_ref[k, 2]
            w = coeff_ref[k, 3]
            v = coeff_ref[k, 4]
            return (
                A * s + c0 * o_lat + sv * n_inj,
                hacc + w * h,
                xi + v * z,
            )

        H_last = layout["h_last"]
        init = (
            s_ref[:].astype(jnp.float32),
            jnp.zeros((tile_b, H_last), jnp.float32),
            jnp.zeros((tile_b, H0), jnp.float32),
        )
        s, hacc, xi = jax.lax.fori_loop(0, n_lat, body, init)
        # Final (t=0) row: only the hidden state is needed — the wide
        # x0 assembly (clip included) happens outside the kernel.
        h0 = hidden(s + t_row(n_lat) + cproj)
        hacc_ref[:] = hacc
        xi_ref[:] = xi
        h0_ref[:] = h0

    return kernel


class LatentFusedSampler:
    """Hybrid data-space head + Pallas latent-tail DDPM sampler.

    Composes the fused data-space kernel (ops/fused_sampler.py,
    `stop_after`) for the clip-sensitive head with the VMEM-resident
    latent-segment kernel above, then reconstructs the wide cohort in
    one shot. Tables come from LatentTailSampler; output distribution
    is identical to the data-space samplers' (see module docstring).
    """

    def __init__(self, model, params, head_steps: int = 1,
                 tile_b: int = 512, interpret: bool = False,
                 gn_mode: str = "bf16"):
        from .fused_sampler import (
            FusedSampler,
            _block_weights,
            _group_mats,
            supports_fused,
        )

        if not (supports_latent(model) and supports_fused(model)):
            raise ValueError(
                "model configuration not supported by the fused "
                "latent-tail sampler"
            )
        self.tables = LatentTailSampler(model, params, head_steps)
        self.model = model
        self.head = FusedSampler(
            model, params, tile_b=tile_b, interpret=interpret,
            gn_mode=gn_mode,
        )
        self.tile_b = tile_b
        self.interpret = interpret
        self.gn_mode = gn_mode
        self.head_steps = head_steps
        d = model.denoiser
        self.data_dim = d.data_dim
        hidden = list(d.hidden_dims)
        self.H0 = hidden[0]

        p = jax.tree_util.tree_map(np.asarray, params)
        weights = []
        layout = {"n_encoder": len(hidden) - 1, "blocks": []}
        enc_in = hidden[0]
        enc_feats = []
        for i, feat in enumerate(hidden[1:]):
            weights += _block_weights(p[f"enc_{i}"], [enc_in], False)
            layout["blocks"].append(("enc", 1, feat))
            enc_feats.append(feat)
            enc_in = feat
        weights += _block_weights(p["bottleneck"], [enc_in], False)
        layout["blocks"].append(("bottleneck", 1, hidden[-1]))
        dec_in = hidden[-1]
        for j, i in enumerate(range(len(hidden) - 2, -1, -1)):
            if not enc_feats:
                break
            skip_feat = enc_feats.pop()
            feat = hidden[i]
            weights += _block_weights(
                p[f"dec_{j}"], [dec_in, skip_feat], False
            )
            layout["blocks"].append(("dec", 2, feat))
            dec_in = feat
        layout["h_last"] = layout["blocks"][-1][2]
        layout["gn_features"] = sorted(
            {f for _, _, f in layout["blocks"]}
        )
        self.H_last = layout["h_last"]
        weights += [
            jnp.asarray(self.tables.M2, jnp.bfloat16),
            jnp.asarray(np.asarray(self.tables.m_b).reshape(1, -1),
                        jnp.float32),
            jnp.asarray(self.tables.L_T, jnp.bfloat16),
        ]
        gmats = []
        for feat in layout["gn_features"]:
            g, gt = _group_mats(feat, gn_mode)
            gmats += [g, gt]
        self.weights = weights
        self.gmats = gmats
        self.layout = layout

        t = self.tables
        # (n_lat, 5): A, c0, sv (segment-local), w, v.
        self.coeffs = jnp.asarray(
            np.stack([
                np.asarray(t.A), np.asarray(t.seg_c0),
                np.asarray(t.seg_sv), np.asarray(t.w), np.asarray(t.v),
            ], axis=1).astype(np.float32)
        ) if len(t.seg_rows) else jnp.zeros((0, 5), jnp.float32)
        self.n_lat = int(len(t.seg_rows))
        # t_add rows for the segment plus the final (t=0) row.
        self.tadd_seg = t.t_add[self.tables.head_steps :]
        self._fns = {}

    # ------------------------------------------------------------------
    def _pallas_fn(self, b_padded: int, noise_mode: str):
        key = (b_padded, noise_mode)
        if key in self._fns:
            return self._fns[key]
        tile_b, H0, H_last = self.tile_b, self.H0, self.H_last
        kernel = _build_latent_kernel(
            self.layout, self.n_lat, tile_b, noise_mode, self.gn_mode
        )

        def full_spec(shape, space=pltpu.VMEM):
            ndim = len(shape)
            return pl.BlockSpec(
                shape, lambda i, _n=ndim: (0,) * _n, memory_space=space
            )

        in_specs = [
            full_spec((1, 1), pltpu.SMEM),
            full_spec(self.coeffs.shape, pltpu.SMEM),
            pl.BlockSpec((tile_b, H0), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),  # s_init
            pl.BlockSpec((tile_b, H0), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),  # c_proj
            full_spec(self.tadd_seg.shape),
        ]
        for w in self.weights + self.gmats:
            in_specs.append(full_spec(w.shape))
        if noise_mode == "buffer":
            in_specs.append(
                pl.BlockSpec((self.n_lat, tile_b, H0),
                             lambda i: (0, i, 0),
                             memory_space=pltpu.VMEM)
            )
        out_specs = [
            pl.BlockSpec((tile_b, H_last), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tile_b, H0), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tile_b, H_last), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ]
        out_shape = [
            jax.ShapeDtypeStruct((b_padded, H_last), jnp.float32),
            jax.ShapeDtypeStruct((b_padded, H0), jnp.float32),
            jax.ShapeDtypeStruct((b_padded, H_last), jnp.float32),
        ]
        fn = pl.pallas_call(
            kernel,
            grid=(b_padded // tile_b,),
            in_specs=in_specs,
            out_specs=out_specs,
            out_shape=out_shape,
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=100 * 1024 * 1024,
            ),
            interpret=self.interpret,
        )
        self._fns[key] = jax.jit(fn)
        return self._fns[key]

    # ------------------------------------------------------------------
    def sample(
        self,
        conditions: jnp.ndarray,
        rng: jax.Array,
        num_samples: Optional[int] = None,
        noise: Optional[jnp.ndarray] = None,
        zeta: Optional[jnp.ndarray] = None,
        eta: Optional[jnp.ndarray] = None,
    ) -> jnp.ndarray:
        """Drop-in equivalent of FusedSampler.sample for the supported
        config. `noise`/`zeta`/`eta`: (T, B, D) head transition noise,
        (n_lat, B, H0) latent draws and the (B, D) reconstruction
        residual for parity tests — deriving zeta_t = L^-1 K^T z_t and
        eta = sum_t v_t z_t / sqrt(v2) from a wide noise stream makes
        the hybrid reproduce the data-space loop exactly. Production
        runs use the on-chip PRNG. Returns float32 (the
        reconstruction's wide algebra runs f32)."""
        if num_samples is None:
            num_samples = conditions.shape[0]
        t = self.tables
        T, D, tile_b = t.T, self.data_dim, self.tile_b
        head_rng, seed_rng, eta_rng = jax.random.split(rng, 3)

        # --- data-space head (clip applied full-width) ----------------
        x_head = self.head.sample(
            conditions, head_rng, num_samples=num_samples,
            noise=noise, stop_after=self.head_steps, keep_bf16=True,
        ).astype(jnp.float32)

        c_proj = t._c_proj(conditions)
        pad_b = -num_samples % tile_b
        b_padded = num_samples + pad_b
        if pad_b:
            x_pad = jnp.pad(x_head, ((0, pad_b), (0, 0)))
            c_pad = jnp.pad(c_proj, ((0, pad_b), (0, 0)))
        else:
            x_pad, c_pad = x_head, c_proj
        s_init = x_pad @ t.K_in

        seed = jax.random.bits(seed_rng, (), jnp.uint32).astype(
            jnp.int32
        ).reshape(1, 1)
        args = [seed, self.coeffs, s_init, c_pad, self.tadd_seg]
        args += self.weights + self.gmats
        noise_mode = "prng" if zeta is None else "buffer"
        if zeta is not None:
            assert zeta.shape == (self.n_lat, num_samples, self.H0)
            if pad_b:
                zeta = jnp.pad(zeta, ((0, 0), (0, pad_b), (0, 0)))
            args.append(zeta.astype(jnp.float32))

        hacc, xi, h0 = self._pallas_fn(b_padded, noise_mode)(*args)
        hacc = hacc[:num_samples]
        xi = xi[:num_samples]
        h0 = h0[:num_samples]

        # --- one-time wide reconstruction ------------------------------
        x1 = t.c_x * x_head + hacc @ t.K_out + t.c_beta * t.b_out
        if eta is None:
            eta = jax.random.normal(eta_rng, (num_samples, D), jnp.float32)
        else:
            eta = eta.astype(jnp.float32)
        resid = eta - (eta @ t.K_in) @ t.R
        x1 = x1 + xi @ t.C_T + np.sqrt(t.v2) * resid
        out0 = h0 @ t.K_out + t.b_out + t.gains_f32[T - 1] * x1
        return jnp.clip(out0, -t.clip_value, t.clip_value)


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
