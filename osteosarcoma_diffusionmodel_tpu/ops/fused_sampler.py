"""Fully-fused Pallas DDPM sampler: the entire T-step reverse loop in
one kernel with everything VMEM-resident.

Why: the scan-compiled sampler (models/diffusion.py) is
HBM-bandwidth-bound — each of the 1000 steps re-reads and re-writes the
(B, 5142) state and re-streams the denoiser weights from HBM. Measured
step anatomy at batch 2048 (BASELINE.md): denoiser 0.181 s + noise
0.174 s ≈ full 0.335 s. This kernel tiles the batch into grid cells of
``TILE_B`` rows and, per cell, loads the x-tile and ALL denoiser
weights into VMEM once, then runs the full reverse loop with a
`jax.lax.fori_loop` — per-step HBM traffic drops to zero (weights
~8 MB bf16 + x tile ~1.3 MB fit comfortably in VMEM), transition noise
comes from the on-chip PRNG, and the posterior update fuses with the
denoiser output in registers.

Scope (the flagship inference configuration; callers fall back to the
scan sampler otherwise — see `supports_fused`):
- x0 parameterization with input-skip gain (networks.DiffusionDenoiser)
- deterministic (no dropout), no classifier-free guidance
- no learned sigma head
- uniform in-scan transition noise (generation.noise_type: uniform),
  bfloat16 state

Numerics: matmuls run bf16 with float32 accumulation
(`preferred_element_type`), GroupNorm statistics in float32 via the
group-membership matmul identity (mean/var per group = h @ G / g), the
posterior update in bfloat16 — matching the scan path's bf16-carry mode
to within bf16 tolerance (tests/test_fused_sampler.py).

Reference counterpart: the Python reverse loop at reference
models/diffusion.py:446-447 (one denoiser launch per step from the
host); SURVEY §2 "on-device DDPM loop".
"""

from __future__ import annotations

from typing import Any, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NUM_GROUPS = 8
GN_EPS = 1e-6
_UNIFORM_SCALE = float(2.0 * np.sqrt(3.0))  # U(-sqrt3, sqrt3), unit var


def supports_fused(model) -> bool:
    """The architecture/config slice this kernel implements.

    The binary D3PM mutation head IS supported (round 2, continued):
    its posterior is closed-form elementwise algebra that rides the
    kernel's full-width arrays under a column mask (ops/discrete.py)."""
    d = model.denoiser
    return (
        model.parameterization == "x0"
        and not model.learn_sigma
        and getattr(model, "low_rank_sigma_dim", 0) == 0
        and d.input_skip
        and model.noise_type == "uniform"
        and model.clip_denoised
        and all(h % NUM_GROUPS == 0 for h in d.hidden_dims)
        and d.hidden_dims[0] % 128 == 0
    )


# ----------------------------------------------------------------------
# Host-side precomputation
# ----------------------------------------------------------------------
def _sinusoid(t_norm: np.ndarray, dim: int) -> np.ndarray:
    """TimeEmbedding parity (networks.py TimeEmbedding)."""
    half = dim // 2
    freqs = np.exp(np.arange(half) * (-np.log(10000.0) / (half - 1)))
    args = t_norm[:, None] * freqs[None, :]
    return np.concatenate([np.sin(args), np.cos(args)], axis=-1).astype(
        np.float32
    )


def _group_mats(features: int, gn_mode: str = "f32") -> Tuple[Any, Any]:
    """GroupNorm stat tables for one feature width.

    "f32": one-hot membership G (F, 8) and its transpose, both f32 —
    the round-2 layout (4 f32 dots per GN).
    "bf16": G/group_size and G^T in bf16 (4 bf16 dots; measured +4.4%
    whole-kernel — the f32 stats dots take multiple MXU passes).
    "merged"/"merged3": G/group_size bf16 forward table and a
    blockdiag(G^T, G^T) (16, 2F) bf16 back table so the two
    expansions ride ONE lane-efficient dot; "merged" additionally
    row-stacks [h; h*h] so the forward stats are one dot too. The
    per-GN dot count (the cost is per-invocation latency, not FLOPs)
    drops 4 -> 3 -> 2."""
    g = np.zeros((features, NUM_GROUPS), np.float32)
    size = features // NUM_GROUPS
    for k in range(NUM_GROUPS):
        g[k * size : (k + 1) * size, k] = 1.0
    if gn_mode == "f32":
        return jnp.asarray(g), jnp.asarray(g.T.copy())
    gfwd = jnp.asarray(g / size, jnp.bfloat16)
    if gn_mode == "bf16":
        return gfwd, jnp.asarray(g.T.copy(), jnp.bfloat16)
    bd2 = np.kron(np.eye(2, dtype=np.float32), g.T)  # (16, 2F)
    return gfwd, jnp.asarray(bd2, jnp.bfloat16)


def _quant_flags(quant) -> Tuple[bool, bool, bool]:
    """(input_proj, blocks, output_proj) int8 flags for a quantize mode.

    Measured per-matmul on v5e (tile 512, production dims): the int8
    MXU path pays ~1.7-2x on the N-wide output projection (K=256,
    N=5142; quantizing the narrow h costs almost nothing), is a WASH or
    a loss on the K-wide input projection (the full-width dynamic
    activation quantize costs more VPU time than the dot saves), and is
    marginal on the small block fcs — hence "out" is the production
    mode; "io"/"all" are kept so the negative is reproducible."""
    if quant is None:
        return (False, False, False)
    return {
        "out": (False, False, True),
        "io": (True, False, True),
        "all": (True, True, True),
    }[quant]


def _pack_mat(w: np.ndarray, quant: bool) -> List[Any]:
    """One matmul weight as kernel inputs: bf16 (one entry) or
    symmetric per-output-column int8 + f32 scale row (two entries).
    The v5e MXU runs s8xs8->s32 at 2x the bf16 rate (measured 138 vs
    78 TOPS at the production shapes), so quantized layers halve the
    matmul time of the whole-loop sampler."""
    if not quant:
        return [jnp.asarray(w, jnp.bfloat16)]
    w = np.asarray(w, np.float32)
    sw = np.maximum(np.abs(w).max(axis=0, keepdims=True), 1e-8) / 127.0
    qw = np.clip(np.round(w / sw), -127, 127).astype(np.int8)
    return [jnp.asarray(qw), jnp.asarray(sw, jnp.float32)]


def _block_weights(p, in_splits: Sequence[int], quant: bool) -> List[Any]:
    """Flatten one DenoiserBlock's params, splitting fc1's kernel rows
    at `in_splits` boundaries (so the decoder's concat becomes a sum of
    matmuls instead of an in-kernel concatenate). Layout per block:
    fc1 parts, fc2 kernel (1 or 2 entries each), then the six f32
    bias/norm vectors."""
    fc1 = np.asarray(p["fc1"]["kernel"], np.float32)
    parts: List[Any] = []
    start = 0
    for s in in_splits:
        parts += _pack_mat(fc1[start : start + s], quant)
        start += s
    assert start == fc1.shape[0], (start, fc1.shape)
    return parts + _pack_mat(p["fc2"]["kernel"], quant) + [
        jnp.asarray(p["fc1"]["bias"], jnp.float32).reshape(1, -1),
        jnp.asarray(p["norm1"]["scale"], jnp.float32).reshape(1, -1),
        jnp.asarray(p["norm1"]["bias"], jnp.float32).reshape(1, -1),
        jnp.asarray(p["fc2"]["bias"], jnp.float32).reshape(1, -1),
        jnp.asarray(p["norm2"]["scale"], jnp.float32).reshape(1, -1),
        jnp.asarray(p["norm2"]["bias"], jnp.float32).reshape(1, -1),
    ]


# ----------------------------------------------------------------------
# Kernel
# ----------------------------------------------------------------------
def _groupnorm(h, g, gt, scale, bias, group_size, gn_mode="f32"):
    """GroupNorm(8) on f32 h via group-membership matmuls.

    The stats cost is dominated by per-dot invocation latency on the
    sequential critical path (measured 30% of the whole fused sampler
    in "f32" mode), so the faster modes cut the DOT COUNT:
    "f32" 4 f32 dots -> "bf16" 4 bf16 dots -> "merged3" 3 ->
    "merged" 2 (see _group_mats for the table layouts)."""
    if gn_mode == "f32":
        sums = (
            jnp.dot(h, g, preferred_element_type=jnp.float32) / group_size
        )  # (tile, 8) per-group mean
        sqs = (
            jnp.dot(h * h, g, preferred_element_type=jnp.float32)
            / group_size
        )
        # E[x^2] - E[x]^2 cancellation can dip below -GN_EPS when
        # |mean| >> std (catastrophic for rsqrt); clamp like every
        # production GN implementation does.
        var = jnp.maximum(sqs - sums * sums, 0.0)
        mean_full = jnp.dot(sums, gt, preferred_element_type=jnp.float32)
        var_full = jnp.dot(var, gt, preferred_element_type=jnp.float32)
        inv = jax.lax.rsqrt(var_full + GN_EPS)
        return (h - mean_full) * inv * scale + bias

    hb = h.astype(jnp.bfloat16)
    if gn_mode == "merged":
        tile = h.shape[0]
        x = jnp.concatenate([hb, hb * hb], axis=0)
        s = jnp.dot(x, g, preferred_element_type=jnp.float32)
        mean, msq = s[:tile], s[tile:]
    else:  # "bf16" / "merged3": two narrow forward dots
        mean = jnp.dot(hb, g, preferred_element_type=jnp.float32)
        msq = jnp.dot(hb * hb, g, preferred_element_type=jnp.float32)
    # bf16-quantized h makes the cancellation error ~2^-8 relative, so
    # the clamp is load-bearing here: a group with |mean|/std >~ 50
    # otherwise drives var below -GN_EPS and rsqrt to NaN.
    var = jnp.maximum(msq - mean * mean, 0.0)
    inv = jax.lax.rsqrt(var + GN_EPS)
    mi = (mean * inv).astype(jnp.bfloat16)
    ib = inv.astype(jnp.bfloat16)
    if gn_mode == "bf16":
        mf = jnp.dot(mi, gt, preferred_element_type=jnp.float32)
        invf = jnp.dot(ib, gt, preferred_element_type=jnp.float32)
    else:  # merged back-projection: one (tile, 16) @ (16, 2F) dot
        F = h.shape[1]
        y = jnp.dot(
            jnp.concatenate([mi, ib], axis=1), gt,
            preferred_element_type=jnp.float32,
        )
        mf, invf = y[:, :F], y[:, F:]
    return (h * invf - mf) * scale + bias


def _build_kernel(layout, T, tile_b, data_dim, clip_value, noise_mode,
                  mut_dim=0, interleave=False, quant=None,
                  gn_mode="bf16", loop_steps=None):
    """Build the kernel body. `layout` describes how the flat ref list
    maps onto layers: a list of ("block", n_in_parts, features) entries
    plus the group-matrix table. Static Python closure — unrolls to a
    fixed denoiser structure at trace time.

    `noise_mode`: "prng" (on-chip PRNG transition noise, the DDPM
    production path), "buffer" (noise streamed in as an input, parity
    tests), or "none" (deterministic update — the eta=0 DDIM path,
    which needs no per-step noise at all).

    `mut_dim`: width of the leading binary D3PM mutation block
    (0 = continuous-only). The state's first `mut_dim` columns hold
    bits; each step feeds the denoiser 2b-1 there, reads x0 logits
    back, and draws the exact binary posterior with the same uniform
    variates the continuous columns turn into transition noise
    (ops/discrete.py posterior_prob_one, inlined elementwise under a
    column mask). With "none" (eta=0 DDIM) the continuous update is
    deterministic but bit draws still consume the on-chip PRNG."""
    # PRNG is needed for transition noise ("prng") and for bit draws
    # whenever a mutation block exists without an injected buffer.
    need_prng = noise_mode == "prng" or (
        mut_dim > 0 and noise_mode != "buffer"
    )

    # Which matmuls carry int8 weights (must agree with the host-side
    # packing in FusedSampler.__init__).
    q_in, q_blk, q_out = _quant_flags(quant)

    def kernel(*refs):
        seed_ref, coeff_ref, x_ref, cproj_ref, tadd_ref = refs[:5]
        idx = 5

        def take_mat(quantized):
            nonlocal idx
            if quantized:
                entry = (refs[idx], refs[idx + 1])
                idx += 2
            else:
                entry = refs[idx]
                idx += 1
            return entry

        w_in = take_mat(q_in)
        block_entries = []
        for kind, n_parts, _feat in layout["blocks"]:
            parts = [take_mat(q_blk) for _ in range(n_parts)]
            fc2 = take_mat(q_blk)
            vecs = refs[idx : idx + 6]
            idx += 6
            block_entries.append((parts, fc2, vecs))
        w_out = take_mat(q_out)
        b_out_ref = refs[idx]
        idx += 1
        gmat_refs = refs[idx : idx + 2 * len(layout["gn_features"])]
        idx += 2 * len(layout["gn_features"])
        noise_ref = refs[idx] if noise_mode == "buffer" else None
        out_ref = refs[-1]

        gn_table = {}
        for k, feat in enumerate(layout["gn_features"]):
            gn_table[feat] = (gmat_refs[2 * k], gmat_refs[2 * k + 1])

        if need_prng:
            pltpu.prng_seed(seed_ref[0, 0], pl.program_id(0))

        cproj = cproj_ref[:].astype(jnp.float32)
        # The mutation block occupies the first `mut_pad` lanes (M
        # rounded up to the 128-lane boundary); all discrete algebra
        # runs on that narrow slice so the posterior's ~15 elementwise
        # ops cost ~MP/D of full-width VPU work.
        mut_pad = min(data_dim, -(-mut_dim // 128) * 128) if mut_dim else 0
        if mut_dim:
            col = jax.lax.broadcasted_iota(jnp.int32, (1, mut_pad), 1)
            mut_mask = (col < mut_dim).astype(jnp.float32)

        def prng_uniform(width=data_dim, rows=tile_b):
            bits = pltpu.bitcast(
                pltpu.prng_random_bits((rows, width)), jnp.uint32
            )
            # uint32 -> f32 is unsupported in Mosaic; the top-24-bit
            # value fits int32 exactly.
            b24 = pltpu.bitcast(bits >> 8, jnp.int32)
            return b24.astype(jnp.float32) * (1.0 / (1 << 24))

        def prng_uniform_wide(rows=tile_b):
            # Full-width per-step transition noise: two 16-bit uniforms
            # per 32-bit hardware draw — the PRNG is pure VPU work
            # serialized against the matmuls, and 2^-16 resolution is
            # ample for noise that only survives sampling through a
            # 1000-step CLT wash (the mutation-bit comparisons reuse
            # the same grid; a 1.5e-5 Bernoulli bias is far below the
            # statistical-parity test floor).
            half = (data_dim + 1) // 2
            bits = pltpu.bitcast(
                pltpu.prng_random_bits((rows, half)), jnp.uint32
            )
            lo = pltpu.bitcast(bits & 0xFFFF, jnp.int32)
            hi = pltpu.bitcast(bits >> 16, jnp.int32)
            u = jnp.concatenate(
                [lo.astype(jnp.float32), hi.astype(jnp.float32)], axis=1
            ) * (1.0 / (1 << 16))
            return u[:, :data_dim]

        def mm(xf, entry):
            """f32 activations @ one packed weight: bf16 MXU dot, or —
            for a (int8, scale) pair — a per-row dynamically-scaled
            s8xs8->s32 MXU dot (2x the bf16 rate) dequantized in f32.
            Per-row activation scales keep full 7-bit resolution as the
            state contracts toward the data manifold over the reverse
            loop (a static scale would waste most of the range there)."""
            if isinstance(entry, tuple):
                wq, sw = entry
                amax = jnp.maximum(
                    jnp.max(jnp.abs(xf), axis=1, keepdims=True), 1e-6
                )
                q = jnp.round(xf * (127.0 / amax)).astype(jnp.int8)
                acc = jax.lax.dot_general(
                    q, wq[:], (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.int32,
                )
                return acc.astype(jnp.float32) * (
                    amax * (1.0 / 127.0)
                ) * sw[:]
            return jnp.dot(
                xf.astype(jnp.bfloat16), entry[:],
                preferred_element_type=jnp.float32,
            )

        n_enc = layout["n_encoder"]

        def make_stages(s, cp):
            """One reverse step as a list of state->state stage
            closures, alternating MXU-dominated (fc dots) and
            VPU-dominated (GroupNorm stats + silu, posterior) stages.
            The sequential and ping-pong paths apply them in order
            (identical op emission to the round-3 monolithic
            step_half); the staggered path offsets two half-tiles by
            one stage so every MXU stage of one half is emitted next
            to a VPU stage of the other — data-independent work the
            Mosaic scheduler can overlap.

            State keys: x (bf16 carry), xf (untransformed f32, the
            posterior's bit view), xf_t (mutation-transformed denoiser
            input), h (activations), skips (trace-time list), out (raw
            prediction)."""
            stages = []

            def st_pre(st):
                # The denoiser sees 2b-1 on mutation columns (scan
                # parity: models/diffusion.py x_in); continuous columns
                # pass through.
                xf = st["x"].astype(jnp.float32)
                st["xf"] = xf
                if mut_dim:
                    left = (1.0 + mut_mask) * xf[:, :mut_pad] - mut_mask
                    if mut_pad < data_dim:
                        xf = jnp.concatenate(
                            [left, xf[:, mut_pad:]], axis=1
                        )
                    else:
                        xf = left
                st["xf_t"] = xf
                h = mm(xf, w_in)
                # Dynamic single-row VMEM loads need 8-aligned indices;
                # a one-hot matmul row-select is unconstrained and
                # cheap ((1,T)@(T,H0) per step).
                onehot = (
                    jax.lax.broadcasted_iota(jnp.int32, (1, T), 1) == s
                ).astype(jnp.float32)
                t_row = jnp.dot(
                    onehot, tadd_ref[:], preferred_element_type=jnp.float32
                )
                st["h"] = h + t_row + cp
                st["skips"] = []
                return st

            stages.append(st_pre)

            for k, (kind, n_parts, feat) in enumerate(layout["blocks"]):
                entry = block_entries[k]
                is_enc = k < n_enc
                is_dec = k > n_enc

                def st_fc1(st, entry=entry, is_dec=is_dec):
                    part_entries, _fc2, vecs = entry
                    parts = [st["h"]]
                    if is_dec:
                        # Decoder: fc1 split into [h | skip] row-parts
                        # (the concat becomes a sum of matmuls).
                        parts.append(st["skips"].pop())
                    acc = None
                    for part, e in zip(parts, part_entries):
                        term = mm(part, e)
                        acc = term if acc is None else acc + term
                    st["h"] = acc + vecs[0][:]
                    return st

                def st_gn1(st, entry=entry, feat=feat):
                    _parts, _fc2, vecs = entry
                    g, gt = gn_table[feat]
                    st["h"] = jax.nn.silu(_groupnorm(
                        st["h"], g[:], gt[:], vecs[1][:], vecs[2][:],
                        feat // NUM_GROUPS, gn_mode,
                    ))
                    return st

                def st_fc2(st, entry=entry):
                    _parts, fc2_entry, vecs = entry
                    st["h"] = mm(st["h"], fc2_entry) + vecs[3][:]
                    return st

                def st_gn2(st, entry=entry, feat=feat, is_enc=is_enc):
                    _parts, _fc2, vecs = entry
                    g, gt = gn_table[feat]
                    h = jax.nn.silu(_groupnorm(
                        st["h"], g[:], gt[:], vecs[4][:], vecs[5][:],
                        feat // NUM_GROUPS, gn_mode,
                    ))
                    if is_enc:
                        st["skips"].append(h)
                    st["h"] = h
                    return st

                stages += [st_fc1, st_gn1, st_fc2, st_gn2]

            def st_out(st):
                out = mm(st["h"], w_out) + b_out_ref[:]
                gain = coeff_ref[s, 3]
                # Raw prediction: x0 for continuous columns, x0-bit
                # LOGITS for mutation columns (clip applied in st_post
                # to the continuous part only).
                st["out"] = out + gain * st["xf_t"]
                return st

            stages.append(st_out)

            def st_post(st):
                out = st["out"]
                xf = st["xf"]
                x0 = jnp.clip(out, -clip_value, clip_value)
                c0 = coeff_ref[s, 0]
                c1 = coeff_ref[s, 1]

                # Per-step uniforms: continuous transition noise and
                # mutation bit draws share one full-width draw ("prng"/
                # "buffer"); the deterministic DDIM path draws only the
                # narrow mutation slice.
                rows = st["x"].shape[0]
                u_m = None
                if noise_mode == "prng":
                    u = prng_uniform_wide(rows)
                    z = (u - 0.5) * _UNIFORM_SCALE
                    if mut_dim:
                        u_m = u[:, :mut_pad]
                elif noise_mode == "buffer":
                    z = noise_ref[s].astype(jnp.float32)
                    if mut_dim:
                        u_m = z[:, :mut_pad] * (1.0 / _UNIFORM_SCALE) + 0.5
                elif mut_dim:  # "none" (eta=0 DDIM) still draws bits
                    u_m = prng_uniform(mut_pad, rows)

                if noise_mode == "none":
                    # Deterministic (eta=0 DDIM) continuous update; the
                    # coefficient table folds the x0/x_t mixing per step.
                    cont_new = c0 * x0 + c1 * xf
                else:
                    sv = coeff_ref[s, 2]
                    cont_new = c0 * x0 + c1 * xf + sv * z

                if not mut_dim:
                    st["x"] = cont_new.astype(jnp.bfloat16)
                    return st

                # Binary D3PM posterior on the (lane-padded) mutation
                # slice (ops/discrete.py posterior_prob_one, elementwise).
                beta = coeff_ref[s, 4]
                acp_prev = coeff_ref[s, 5]
                xm = xf[:, :mut_pad]
                p1 = jax.nn.sigmoid(out[:, :mut_pad])
                half_beta = 0.5 * beta
                f1 = (1.0 - beta) * xm + half_beta
                f0 = (1.0 - beta) * (1.0 - xm) + half_beta
                half_om = 0.5 * (1.0 - acp_prev)
                g_same = acp_prev + half_om
                a1_i1 = f1 * g_same
                a0_i1 = f0 * half_om
                a1_i0 = f1 * half_om
                a0_i0 = f0 * g_same
                post1_i1 = a1_i1 / (a1_i1 + a0_i1)
                post1_i0 = a1_i0 / (a1_i0 + a0_i0)
                p_prev = p1 * post1_i1 + (1.0 - p1) * post1_i0
                mut_new = (u_m < p_prev).astype(jnp.float32)
                left = (
                    mut_mask * mut_new
                    + (1.0 - mut_mask) * cont_new[:, :mut_pad]
                )
                if mut_pad < data_dim:
                    x_new = jnp.concatenate(
                        [left, cont_new[:, mut_pad:]], axis=1
                    )
                else:
                    x_new = left
                st["x"] = x_new.astype(jnp.bfloat16)
                return st

            stages.append(st_post)
            return stages

        def step_half(s, x, cp=None):
            st = {"x": x}
            for f in make_stages(s, cproj if cp is None else cp):
                st = f(st)
            return st["x"]

        n_run = T if loop_steps is None else loop_steps

        if interleave:
            cpa, cpb = jnp.split(cproj, 2, axis=0)

            if interleave == "staggered":
                # Two-half software pipeline: half B trails half A by
                # exactly one stage, so the emission order pairs B's
                # fc dot (MXU) with A's GroupNorm stats + silu (VPU)
                # and vice versa — independent work adjacent in
                # program order for the scheduler to overlap, instead
                # of one strict MXU->VPU->MXU dependency chain
                # (round-3 measured GN stats = 30% of kernel time).
                def body(s, halves):
                    sa = {"x": halves[0]}
                    sb = {"x": halves[1]}
                    stages_a = make_stages(s, cpa)
                    stages_b = make_stages(s, cpb)
                    sa = stages_a[0](sa)
                    for k in range(1, len(stages_a)):
                        sa = stages_a[k](sa)
                        sb = stages_b[k - 1](sb)
                    sb = stages_b[-1](sb)
                    return sa["x"], sb["x"]
            else:
                # Ping-pong half-tiles (round-3 experiment, kept
                # reproducible): both halves' full chains per step,
                # emitted one after the other — the compiler is free
                # (but measured unwilling, -2%) to overlap them.
                def body(s, halves):
                    return (
                        step_half(s, halves[0], cpa),
                        step_half(s, halves[1], cpb),
                    )

            xa, xb = jnp.split(x_ref[:], 2, axis=0)
            ya, yb = jax.lax.fori_loop(0, n_run, body, (xa, xb))
            out_ref[:] = jnp.concatenate([ya, yb], axis=0)
        else:
            out_ref[:] = jax.lax.fori_loop(0, n_run, step_half, x_ref[:])

    return kernel


# ----------------------------------------------------------------------
# Entry point
# ----------------------------------------------------------------------
class FusedSampler:
    """Precomputes tables/weight layout once per (model, params) on the
    host (concrete arrays required — construct OUTSIDE jit), then serves
    jitted fused sampling calls, cached per padded batch size."""

    def __init__(self, model, params, tile_b: int = 512,
                 interpret: bool = False,
                 ddim_steps: Optional[int] = None,
                 interleave=False,
                 quantize: Optional[str] = None,
                 gn_mode: str = "bf16"):
        """`ddim_steps`: when set, the kernel runs the deterministic
        (eta=0) DDIM update over that many strided timesteps instead of
        the full T-step ancestral loop — same VMEM-resident structure,
        no per-step noise at all (models/diffusion.py sample_ddim
        algebra, x0 parameterization).

        `interleave`: run the loop over two independent half-tiles.
        True/"pingpong" emits both halves' full per-step chains back
        to back (round-3 experiment: -2%, the compiler would not
        overlap them). "staggered" offsets the halves by one pipeline
        stage so MXU stages of one half are emitted adjacent to VPU
        stages (GroupNorm stats, posterior) of the other — the round-4
        attack on the measured 30%-of-kernel GN-stats serial tail.
        Statistically identical output either way.

        `quantize`: int8 MXU mode — None (bf16 everywhere, default),
        "out" (the N-wide output projection), "io" (both data_dim-wide
        projections), "all" (every fc layer). Per-channel int8 weights
        + per-row dynamically-scaled int8 activations; the s8xs8->s32
        MXU path runs ~1.7-2x the bf16 rate in isolation, but measured
        END TO END on the DDPM kernel every mode is a wash or a small
        loss (12.1-12.5k vs 12.5k patients/sec): the quantize/dequant
        VPU work sits on the same serial critical path the faster dot
        shortens. The deterministic DDIM-1000 variant gains ~2% with
        "out". Kept selectable so the negative is reproducible;
        output deviation vs bf16 is ~1-2% RMS (elemwise corr 0.999).

        `gn_mode`: GroupNorm stats implementation — "bf16" (default;
        4 bf16 stats dots, measured +4.7% whole-kernel vs "f32"),
        "f32" (round-2 layout, exact flax parity), "merged3"/"merged"
        (fewer, merged dots — measured no better than "bf16"). GN
        stats are 30% of kernel time (measured by ablation); the cost
        is critical-path latency, so lane-packing the dots doesn't
        help and a pltpu.repeat broadcast is 1.7x SLOWER end to end
        (8-lane -> full-width relayout)."""
        if not supports_fused(model):
            raise ValueError(
                "model configuration not supported by the fused sampler; "
                "use model.sample"
            )
        self.model = model
        self.params = params
        self.tile_b = tile_b
        self.interpret = interpret
        if interleave not in (False, True, "pingpong", "staggered"):
            raise ValueError(f"unknown interleave mode {interleave!r}")
        if interleave is True:
            interleave = "pingpong"
        self.interleave = (interleave or False) if tile_b % 16 == 0 else False
        if quantize not in (None, "out", "io", "all"):
            raise ValueError(
                f"quantize must be None/'out'/'io'/'all', got {quantize!r}"
            )
        self.quantize = quantize
        if gn_mode not in ("f32", "bf16", "merged3", "merged"):
            raise ValueError(f"unknown gn_mode {gn_mode!r}")
        self.gn_mode = gn_mode
        d = model.denoiser
        self.data_dim = d.data_dim
        self.hidden = list(d.hidden_dims)
        sched = model.schedule
        self.T = sched.num_steps
        self.ddim_steps = ddim_steps
        self.deterministic = ddim_steps is not None

        # --- per-step tables (reverse-time order, last row = t=0) -----
        if ddim_steps is None:
            ts = np.arange(self.T - 1, -1, -1)
        else:
            from .schedules import ddim_timesteps

            ts = ddim_timesteps(self.T, ddim_steps)[::-1].copy()
        self.n_loop = len(ts)
        t_norm = ts.astype(np.float64) / self.T
        sin = _sinusoid(t_norm, d.time_dim)
        p = jax.tree_util.tree_map(np.asarray, params)
        t_emb = sin @ p["time_proj"]["kernel"] + p["time_proj"]["bias"]
        gains = sin @ p["skip_gain"]["kernel"] + p["skip_gain"]["bias"]
        # f32: consumed via a one-hot matmul row-select in the kernel.
        self.t_add = jnp.asarray(
            t_emb + p["input_proj"]["bias"], jnp.float32
        )

        if ddim_steps is None:
            coef_x0 = np.asarray(sched.posterior_coef_x0)[ts].copy()
            coef_xt = np.asarray(sched.posterior_coef_xt)[ts].copy()
            sqrt_var = np.sqrt(np.asarray(sched.posterior_variance)[ts])
            # Final step (t=0): return clip(x0_pred) — no posterior, no
            # noise.
            coef_x0[-1], coef_xt[-1], sqrt_var[-1] = 1.0, 0.0, 0.0
        else:
            # x_prev = sqrt(acp_prev)·x0 + sqrt(1-acp_prev)·eps with
            # eps recomputed from the clipped x0 — linearized into
            # c0·x0 + c1·x_t (sample_ddim, eta=0).
            acp = np.asarray(sched.alphas_cumprod, np.float64)
            acp_t = acp[ts]
            prev = np.concatenate([ts[1:], np.array([-1])])
            acp_prev = np.where(prev >= 0, acp[np.maximum(prev, 0)], 1.0)
            coef_xt = np.sqrt((1.0 - acp_prev) / (1.0 - acp_t))
            coef_x0 = np.sqrt(acp_prev) - coef_xt * np.sqrt(acp_t)
            sqrt_var = np.zeros_like(coef_x0)

        # Binary D3PM mutation-block columns (zeros when the model has
        # no discrete head). DDPM uses the one-step (beta_t, acp_{t-1})
        # pair; DDIM composes the strided jump into an effective flip
        # rate 1 - acp_t/acp_prev (the uniform chain composes exactly,
        # models/diffusion.py sample_ddim). The last row's acp_prev = 1
        # collapses the posterior to the predicted x0 Bernoulli — bits
        # exit binary with correct per-gene frequencies.
        self.mut_dim = model.mutation_dim if model.discrete_head else 0
        acp_full = np.asarray(sched.alphas_cumprod, np.float64)
        if self.mut_dim:
            if ddim_steps is None:
                mut_beta = np.asarray(sched.betas, np.float64)[ts]
                mut_acp_prev = np.where(
                    ts >= 1, acp_full[np.maximum(ts - 1, 0)], 1.0
                )
            else:
                mut_acp_prev = acp_prev
                mut_beta = 1.0 - acp_full[ts] / mut_acp_prev
        else:
            mut_beta = np.zeros_like(coef_x0)
            mut_acp_prev = np.zeros_like(coef_x0)
        self.coeffs = jnp.asarray(
            np.stack(
                [coef_x0, coef_xt, sqrt_var, gains[:, 0],
                 mut_beta, mut_acp_prev], axis=1
            ).astype(np.float32)
        )  # (n_loop, 6)

        # --- weights, flattened in kernel order -----------------------
        hidden = self.hidden
        q_in, q_blk, q_out = _quant_flags(quantize)
        weights: List[Any] = _pack_mat(p["input_proj"]["kernel"], q_in)
        layout = {"n_encoder": len(hidden) - 1, "blocks": [],
                  "quant": quantize}
        enc_in = hidden[0]
        enc_feats = []
        for i, feat in enumerate(hidden[1:]):
            weights += _block_weights(p[f"enc_{i}"], [enc_in], q_blk)
            layout["blocks"].append(("enc", 1, feat))
            enc_feats.append(feat)
            enc_in = feat
        weights += _block_weights(p["bottleneck"], [enc_in], q_blk)
        layout["blocks"].append(("bottleneck", 1, hidden[-1]))
        dec_in = hidden[-1]
        for j, i in enumerate(range(len(hidden) - 2, -1, -1)):
            if not enc_feats:
                break
            skip_feat = enc_feats.pop()
            feat = hidden[i]
            weights += _block_weights(p[f"dec_{j}"], [dec_in, skip_feat],
                                      q_blk)
            layout["blocks"].append(("dec", 2, feat))
            dec_in = feat
        weights += _pack_mat(p["output_proj"]["kernel"], q_out) + [
            jnp.asarray(p["output_proj"]["bias"], jnp.float32).reshape(1, -1),
        ]
        layout["gn_features"] = sorted({f for _, _, f in layout["blocks"]})
        gmats: List[Any] = []
        for feat in layout["gn_features"]:
            g, gt = _group_mats(feat, self.gn_mode)
            gmats += [g, gt]
        self.weights = weights
        self.gmats = gmats
        self.layout = layout
        self._fns = {}

    # ------------------------------------------------------------------
    def _pallas_fn(self, b_padded: int, noise_mode: str,
                   loop_steps: Optional[int] = None):
        key = (b_padded, noise_mode, loop_steps)
        if key in self._fns:
            return self._fns[key]
        tile_b, D, T = self.tile_b, self.data_dim, self.n_loop
        kernel = _build_kernel(
            self.layout, T, tile_b, D,
            self.model.denoised_clip_value, noise_mode,
            loop_steps=loop_steps,
            mut_dim=self.mut_dim,
            # Buffer mode streams full-tile noise slabs; the
            # half-tile split would mismatch them (parity tests
            # use buffer mode and need the exact single-chain
            # order anyway).
            interleave=(
                False if noise_mode == "buffer" else self.interleave
            ),
            quant=self.quantize,
            gn_mode=self.gn_mode,
        )

        def full_spec(shape, space=pltpu.VMEM):
            ndim = len(shape)
            return pl.BlockSpec(
                shape, lambda i, _n=ndim: (0,) * _n, memory_space=space
            )

        in_specs = [
            full_spec((1, 1), pltpu.SMEM),                      # seed
            full_spec(self.coeffs.shape, pltpu.SMEM),           # coeffs
            pl.BlockSpec((tile_b, D), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),              # x_init
            pl.BlockSpec((tile_b, self.hidden[0]), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),              # c_proj
            full_spec(self.t_add.shape),
        ]
        for w in self.weights + self.gmats:
            in_specs.append(full_spec(w.shape))
        if noise_mode == "buffer":
            in_specs.append(
                pl.BlockSpec((T, tile_b, D), lambda i: (0, i, 0),
                             memory_space=pltpu.VMEM)
            )

        fn = pl.pallas_call(
            kernel,
            grid=(b_padded // tile_b,),
            in_specs=in_specs,
            out_specs=pl.BlockSpec((tile_b, D), lambda i: (i, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((b_padded, D), jnp.bfloat16),
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=100 * 1024 * 1024,
            ),
            interpret=self.interpret,
        )
        self._fns[key] = jax.jit(fn)
        return self._fns[key]

    # ------------------------------------------------------------------
    def estimated_vmem_bytes(self) -> int:
        """Rough VMEM footprint of one grid cell: all weights/tables
        (single-buffered invariants) + double-buffered x input/output
        windows + the largest activation working set. Used by
        `maybe_fused_sampler` to fall back to the scan path before a
        Mosaic out-of-VMEM compile error (a 2048-row tile at production
        dims measured 147 MB vs the 128 MB budget)."""
        weight_bytes = sum(
            int(np.prod(w.shape)) * w.dtype.itemsize
            for w in self.weights + self.gmats
        )
        # x in + out windows, bf16, 2 buffering levels each (matches
        # the 41 MB-per-window figures in the measured tile-2048 OOM).
        x_windows = 2 * 2 * self.tile_b * self.data_dim * 2
        cproj = 2 * self.tile_b * self.hidden[0] * 2
        # Register/spill working set: empirically ~15 live
        # max-hidden-width f32 rows per batch row (63.8 MB of spill
        # slots at tile 2048 with hidden 512).
        act = 15 * self.tile_b * max(self.hidden) * 4
        return weight_bytes + x_windows + cproj + act

    def _x_init(self, init_rng: jax.Array, b_padded: int) -> jnp.ndarray:
        """x_T prior: Gaussian for continuous columns; uniform
        Bernoulli(1/2) bits on the mutation block with a discrete head
        (scan parity: models/diffusion.py sample())."""
        D = self.data_dim
        if not self.mut_dim:
            return jax.random.normal(init_rng, (b_padded, D), jnp.bfloat16)
        cont_rng, bit_rng = jax.random.split(init_rng)
        bits = jax.random.bernoulli(
            bit_rng, 0.5, (b_padded, self.mut_dim)
        ).astype(jnp.bfloat16)
        cont = jax.random.normal(
            cont_rng, (b_padded, D - self.mut_dim), jnp.bfloat16
        )
        return jnp.concatenate([bits, cont], axis=1)

    def sample(
        self,
        conditions: jnp.ndarray,
        rng: jax.Array,
        num_samples: Optional[int] = None,
        noise: Optional[jnp.ndarray] = None,
        keep_bf16: bool = False,
        stop_after: Optional[int] = None,
    ) -> jnp.ndarray:
        """Drop-in equivalent of ConditionalDiffusion.sample for the
        supported config. `noise`: optional (T, B, D) per-step
        transition noise for parity tests (replaces the in-kernel
        PRNG). `keep_bf16`: skip the f32 output upcast — the loop
        carry is bf16, so the values are bf16-precision either way and
        the device->host readback (the measured bottleneck for warm
        10k-cohort generates on the tunneled backend) halves.
        `stop_after`: run only the first N reverse rows and return the
        intermediate state x_{t(N)} — the data-space HEAD of the
        latent-tail hybrid (ops/latent_sampler.py), which covers the
        steps where the x0 clip can bind before the loop switches to
        hidden space."""
        if num_samples is None:
            num_samples = conditions.shape[0]
        d = self.model.denoiser
        D, T, tile_b = self.data_dim, self.n_loop, self.tile_b

        init_rng, seed_rng = jax.random.split(rng)
        c_proj = d.apply(
            {"params": self.params}, conditions,
            method=type(d).embed_conditions,
        ).astype(jnp.bfloat16)
        pad_b = -num_samples % tile_b
        if pad_b:
            c_proj = jnp.pad(c_proj, ((0, pad_b), (0, 0)))
        b_padded = num_samples + pad_b
        x_init = self._x_init(init_rng, b_padded)
        seed = jax.random.bits(seed_rng, (), jnp.uint32).astype(
            jnp.int32
        ).reshape(1, 1)

        args = [seed, self.coeffs, x_init, c_proj, self.t_add]
        args += self.weights + self.gmats
        if self.deterministic:
            assert noise is None, "eta=0 DDIM takes no transition noise"
            noise_mode = "none"
        else:
            noise_mode = "prng" if noise is None else "buffer"
        if noise_mode == "buffer":
            assert noise.shape == (T, num_samples, D), noise.shape
            if pad_b:
                noise = jnp.pad(noise, ((0, 0), (0, pad_b), (0, 0)))
            args.append(noise.astype(jnp.float32))

        out = self._pallas_fn(b_padded, noise_mode, stop_after)(*args)
        return out[:num_samples].astype(
            jnp.bfloat16 if keep_bf16 else jnp.float32
        )


    # ------------------------------------------------------------------
    def sample_sharded(
        self,
        mesh,
        conditions: jnp.ndarray,
        rng: jax.Array,
        num_samples: Optional[int] = None,
        noise: Optional[jnp.ndarray] = None,
        keep_bf16: bool = False,
    ) -> jnp.ndarray:
        """Data-parallel fused sampling: each device of the mesh's
        `data` axis runs the whole-loop kernel on its cohort shard
        (shard_map; weights/tables replicated, per-device PRNG seeds).
        """
        from jax.experimental.shard_map import shard_map
        from jax.sharding import PartitionSpec as P

        if num_samples is None:
            num_samples = conditions.shape[0]
        d = self.model.denoiser
        D, T = self.data_dim, self.n_loop
        n_dev = mesh.shape["data"]
        chunk = n_dev * self.tile_b
        pad_b = -num_samples % chunk
        b_padded = num_samples + pad_b
        per_dev = b_padded // n_dev

        init_rng, seed_rng = jax.random.split(rng)
        c_proj = d.apply(
            {"params": self.params}, conditions,
            method=type(d).embed_conditions,
        ).astype(jnp.bfloat16)
        if pad_b:
            c_proj = jnp.pad(c_proj, ((0, pad_b), (0, 0)))
        x_init = self._x_init(init_rng, b_padded)
        # One independent seed per device (the kernel further folds in
        # the grid-cell index).
        seeds = jax.random.bits(seed_rng, (n_dev, 1), jnp.uint32).astype(
            jnp.int32
        )

        if self.deterministic:
            assert noise is None, "eta=0 DDIM takes no transition noise"
            noise_mode = "none"
        else:
            noise_mode = "prng" if noise is None else "buffer"
        fn = self._pallas_fn(per_dev, noise_mode)
        consts = [self.coeffs, self.t_add] + self.weights + self.gmats

        def per_device(seed, x, c, *rest):
            if noise is None:
                coeffs, t_add = rest[0], rest[1]
                ws = rest[2:]
                return fn(seed, coeffs, x, c, t_add, *ws)
            coeffs, t_add = rest[0], rest[1]
            ws = rest[2:-1]
            return fn(seed, coeffs, x, c, t_add, *ws, rest[-1])

        in_specs = [P("data", None), P("data", None), P("data", None)]
        in_specs += [P() for _ in consts]
        args = [seeds, x_init, c_proj] + consts
        if noise is not None:
            assert noise.shape == (T, num_samples, D), noise.shape
            if pad_b:
                noise = jnp.pad(noise, ((0, 0), (0, pad_b), (0, 0)))
            in_specs.append(P(None, "data", None))
            args.append(noise.astype(jnp.float32))

        sharded = shard_map(
            per_device,
            mesh=mesh,
            in_specs=tuple(in_specs),
            out_specs=P("data", None),
            check_rep=False,
        )
        out = sharded(*args)
        return out[:num_samples].astype(
            jnp.bfloat16 if keep_bf16 else jnp.float32
        )


def maybe_fused_sampler(model, params, tile_b: int = 512,
                        ddim_steps: Optional[int] = None,
                        quantize: Optional[str] = None,
                        gn_mode: str = "bf16",
                        interleave=False):
    """FusedSampler when the config AND backend support it, else None.

    The compiled kernel is Mosaic/TPU-only; on CPU (tests, virtual
    meshes) callers fall back to the scan sampler (interpret-mode use
    constructs FusedSampler directly). `ddim_steps` builds the
    deterministic strided-DDIM variant instead of the full DDPM loop;
    `quantize` ("io"/"all") selects the int8 MXU kernel variants;
    `gn_mode` "f32" restores the round-2 exact-flax-parity GroupNorm
    stats (the "bf16" default is +4.7% throughput but changes
    fixed-seed numerics vs round-2 goldens — config path:
    generation.fused_gn_mode); `interleave` ("staggered"/"pingpong")
    selects the two-half-tile loop layouts (config path:
    generation.fused_interleave).
    """
    if jax.devices()[0].platform not in ("tpu", "axon"):
        return None
    if not supports_fused(model):
        return None
    sampler = FusedSampler(model, params, tile_b=tile_b, ddim_steps=ddim_steps,
                           quantize=quantize, gn_mode=gn_mode,
                           interleave=interleave)
    # Fall back cleanly when the working set can't fit VMEM (e.g. a
    # much wider denoiser than the flagship config) instead of failing
    # at compile time.
    budget = 128 * 1024 * 1024  # v5e VMEM; tile 1024 fits, 2048 does not
    est = sampler.estimated_vmem_bytes()
    if est > budget:
        import logging

        logging.getLogger(__name__).info(
            "fused sampler: estimated VMEM %d MB exceeds the %d MB "
            "budget; using the scan path",
            est // (1024 * 1024), budget // (1024 * 1024),
        )
        return None
    return sampler
