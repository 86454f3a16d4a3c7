"""Fused teacher-forced decoder scan: forward + custom-VJP backward kernels.

Training hot loop (a) of SURVEY.md §3.2. The XLA ``nn.scan`` training
step measured 41 ms device time at batch 32 × 800 frames of which the
backward pass is ~35.5 ms: XLA autodiff stores every per-step
intermediate — including the (B, S, A) attention tanh — to HBM during
the forward scan and streams it back in reverse (scripts/
profile_train_ablate.py, BASELINE.md). This module runs the whole
scanned region (prenet → attention ZoneoutLSTM → forward + additive
attention → 2 residual ZoneoutLSTMs) as ONE Pallas kernel per direction:

* forward: one ``fori_loop`` over the N decoder steps with weights and
  memories resident in VMEM; emits features (N, B, DU) and alignments
  directly to VMEM outputs and streams one packed carry row per step to
  HBM (the only residual needed — everything else is recomputed).
* backward: iterates t = N−1 … 0, DMA-ing carry rows back in, recomputing
  the step's internals from the carry (flash-style recompute instead of
  the 3+ GB intermediate round-trip), and accumulating weight /
  conditioning gradients in VMEM accumulators.

Stochastic masks (prenet dropout, train-mode binary zoneout) come from
the on-core PRNG re-seeded per step with ``seed + t`` so the backward
regenerates bit-identical masks — nothing stochastic is stored. The
bitstream differs from the XLA path's threefry (same Bernoulli
distribution), exactly like ops/fused_decode.py's prenet dropout.

The decoder self-attention block and the output projection run OUTSIDE
the scan in training (Decoder.post) and stay on the XLA path — they are
full-sequence MXU matmuls XLA already handles well.

Covers the same configuration family as the AR kernel
(ops/fused_decode.py): single/dual source, forward attention ± transition
agent, optional speaker embedding, 2-layer prenet, 2 decoder LSTMs.
"""

from __future__ import annotations

import functools
from typing import Dict, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -1e9
_EPS = 1e-6

# tests force interpreter mode through this switch (CPU CI)
FORCE_INTERPRET = False


def _sigmoid(x):
    return jax.nn.sigmoid(x)


def _ceil128(x: int) -> int:
    return ((x + 127) // 128) * 128


def _is_ls(cfg) -> bool:
    return cfg.get("src1_kind", "forward") == "location_sensitive"


def _ls_carries_cum(cfg) -> bool:
    return _is_ls(cfg) and cfg.get("ls_cumulative", True)


def _ls_kpad(cfg) -> int:
    """TAP width: location-conv taps padded to the f32 sublane tile."""
    return ((cfg.get("ls_kernel", 31) + 7) // 8) * 8


def _ls_tap_major(cfg) -> bool:
    """Tap-major TAP layout needs the (B, S) → B·S lane collapse, which
    Mosaic only supports when S is lane-tile aligned (the (32,8,32) →
    (32,256) cast is an 'unsupported shape cast'; (32,32,128) → (32,4096)
    compiles and runs). Small-S configs (tests, short corpora) take the
    r4 lane-store layout instead — correct everywhere, and its per-tap
    RMW cost only matters at production shapes, which bucket to 128."""
    return cfg["src_len"] % 128 == 0


def _init_alpha(cfg):
    """Initial source-1 alignment: one-hot at 0 for the forward-attention
    recursion, uniform for the additive family (location-sensitive) —
    models/attention.py initial_attention_state semantics."""
    B, S = cfg["batch"], cfg["src_len"]
    if _is_ls(cfg):
        return jnp.full((B, S), 1.0 / S, jnp.float32)
    return (
        jax.lax.broadcasted_iota(jnp.int32, (B, S), 1) == 0
    ).astype(jnp.float32)


def _needs_prng(cfg) -> bool:
    """In-kernel PRNG is needed only for TRAIN-mode zoneout: eval zoneout
    is the deterministic interpolation ``z·prev + (1−z)·new`` (modules.py
    ZoneoutLSTMCell), which the kernel expresses as a CONSTANT keep-mask —
    no random bits drawn. Prenet dropout (stochastic in eval too —
    inference dropout is load-bearing, models/modules.py PreNet) happens
    OUTSIDE the kernel: the prenet depends only on the teacher feeds, so
    it is hoisted to one batched (B·N) matmul pair in teacher_decode."""
    return not cfg.get("eval_zoneout", False) and (
        cfg["zoneout_cell"] > 0.0 or cfg["zoneout_output"] > 0.0
    )


def _carry_layout(cfg):
    """Packed carry row layout: name → (offset, width)."""
    AU, DU = cfg["att_units"], cfg["dec_units"]
    E1 = cfg["mem1_dim"]
    E2 = cfg["mem2_dim"] if cfg["dual"] else 0
    S = cfg["src_len"]
    fields = [
        ("c_att", AU), ("h_att", AU),
        ("c1", DU), ("h1", DU), ("c2", DU), ("h2", DU),
        ("ctx1", E1),
    ]
    if cfg["dual"]:
        fields.append(("ctx2", E2))
    fields.append(("alpha", S))
    if _ls_carries_cum(cfg):
        fields.append(("cum", S))
    fields.append(("u", 1))
    layout = {}
    off = 0
    for name, width in fields:
        layout[name] = (off, width)
        off += width
    return layout, _ceil128(off)


def _keep_u32(p: float) -> np.uint32:
    return np.uint32(min(int(p * 2**32), 2**32 - 1))


def _acts_layout(cfg):
    """Per-step activation row exported by the FORWARD kernel.

    The round-2 backward recomputed the whole step from the carries (a
    second forward pass: prenet + 3 LSTM matmuls + query/score matmuls +
    2 softmaxes + 2 context reductions ≈ 13.5 µs of the 33.8 µs/step
    backward). Exporting these activations instead (~500 KB/step, ring-
    buffered DMA fully overlapped with compute; ~0.5 ms of HBM round trip
    across 400 steps) turns the backward into a pure adjoint chain —
    every gate/tanh value the chain needs is either here, in the carries
    (states, alignments, contexts at t and t−1), or one cheap elementwise
    op away. The only recomputed tensor is the (B, S, A) score tanh
    (one VPU pass from the exported ``qp``), whose value feeds d_keys.
    """
    AU, DU = cfg["att_units"], cfg["dec_units"]
    S = cfg["src_len"]
    a_tot = cfg["att1_units"] + (cfg["att2_units"] if cfg["dual"] else 0)
    fields = [
        ("z_att", 4 * AU), ("z1", 4 * DU), ("z2", 4 * DU),
        ("qp", a_tot), ("y1", S),
    ]
    if cfg["dual"]:
        fields.append(("alpha2", S))
    layout = {}
    off = 0
    for name, width in fields:
        layout[name] = (off, width)
        off += width
    return layout, _ceil128(off)


def fused_teacher_fits(
    *, batch: int, num_steps: int, src_len: int, feed_dim: int,
    dec_units: int, mem_dims: int, key_dim: int, io_bytes: int, dual: bool,
    ls_taps: int = 0, att1_units: int = 0,
) -> bool:
    """VMEM-budget check for the training fast path (ADVICE r2, medium).

    The backward kernel keeps the (N, B, ·) feeds, feature/alignment
    cotangents, the conditioning tensors, and the d_keys accumulator
    VMEM-resident under the 100 MB scoped limit; large batch × length
    products (e.g. batch 64 at 800 frames) must fall back to the XLA
    scan instead of failing at Mosaic compile. ``mem_dims`` is the sum
    of memory-stream widths; ``key_dim`` the concatenated key width.
    """
    budget = 80 * 1024 * 1024
    align_pad = _ceil128((2 if dual else 1) * src_len)
    # (N, B, ·): feeds + feature cotangent (f32) + alignment cotangent (f32)
    nb = num_steps * batch * (feed_dim * io_bytes + dec_units * 4 + align_pad * 4)
    # conditioning (keys + memories, io dtype) + d_keys accumulator (f32)
    # + the backward's canonical score-tanh scratch (f32)
    cond = batch * src_len * ((key_dim + mem_dims) * io_bytes + key_dim * 8)
    # carry/acts/stack DMA rings + canonicalization scratches (~80 KB/lane)
    rings = batch * 80 * 1024
    # location-sensitive: the (K_pad, B, S) TAP scratch + the backward's
    # (B, S, K_pad) g_TAP scratch + wider carry rows (the cumulative-
    # alignment field streams with the carries) + the backward kernel's
    # (B, S, A1) f32 g_loc canonicalization scratch (ADVICE r4 low)
    ls = (
        batch * src_len * (2 * (((ls_taps + 7) // 8) * 8) + 2 + att1_units) * 4
        if ls_taps else 0
    )
    margin = 6 * 1024 * 1024  # weights + transposed weights + small refs
    return nb + cond + rings + ls + margin < budget


def fused_teacher_max_batch(**fits_kw) -> int:
    """Largest per-launch batch (multiple of 8) within the VMEM budget,
    or 0 when even an 8-lane block cannot fit (e.g. num_steps so large
    the (N, B, ·) buffers alone overflow)."""
    b = 512
    while b >= 8 and not fused_teacher_fits(batch=b, **fits_kw):
        b //= 2
    return b if b >= 8 else 0


# --------------------------------------------------------------------------- #
# Shared per-step forward computation (used by fwd kernel and bwd recompute)
# --------------------------------------------------------------------------- #


def _make_mask_fns(cfg):
    """Stochastic-mask regeneration shared by forward and backward.

    Draws happen in a fixed global order per step (z_att_c, z_att_h,
    z1_c, z1_h, z2_c, z2_h, with disabled kinds skipped) so the backward
    reproduces the forward's masks bit-identically from the same per-step
    seed. Prenet dropout masks are drawn OUTSIDE the kernel (the prenet
    is hoisted — see teacher_decode).
    """
    B = cfg["batch"]
    zc, zo = cfg["zoneout_cell"], cfg["zoneout_output"]
    zc_bits = _keep_u32(zc)
    zo_bits = _keep_u32(zo)
    interpret = cfg["interpret"]
    draw_counter = [0]  # static draw id; trace order is identical fwd/bwd

    def draw_mask(shape, threshold):
        draw_counter[0] += 1
        if interpret:
            # counter-based murmur3-finalizer hash: pltpu.prng_* has no
            # CPU interpret lowering; this path is test-only. Inputs:
            # (seed + t) is seeded via _seed_state by the caller.
            base = (
                _seed_state[0].astype(jnp.uint32) * jnp.uint32(0x9E3779B9)
                + jnp.uint32((draw_counter[0] * 0x85EBCA6B) & 0xFFFFFFFF)
            )
            idx = jax.lax.broadcasted_iota(jnp.uint32, shape, 0) * jnp.uint32(
                shape[1]
            ) + jax.lax.broadcasted_iota(jnp.uint32, shape, 1)
            x = base + idx * jnp.uint32(0xC2B2AE35)
            x = x ^ (x >> 16)
            x = x * jnp.uint32(0x85EBCA6B)
            x = x ^ (x >> 13)
            x = x * jnp.uint32(0xC2B2AE35)
            x = x ^ (x >> 16)
            bits = x
        else:
            bits = pltpu.bitcast(pltpu.prng_random_bits(shape), jnp.uint32)
        return (bits < threshold).astype(jnp.float32)

    _seed_state = [jnp.zeros((), jnp.int32)]

    def seed_step(seed_plus_t):
        """Seed the step's mask stream (both kernels call this per step)."""
        draw_counter[0] = 0
        if interpret:
            _seed_state[0] = seed_plus_t
        else:
            pltpu.prng_seed(seed_plus_t)

    eval_zoneout = cfg.get("eval_zoneout", False)

    def zoneout_masks(width):
        # keep_old masks (1.0 = keep previous state), drawn c then h.
        # Eval mode: the keep-mask is the CONSTANT zoneout factor — the
        # blend c_prev·m + c_new·(1−m) is then exactly the deterministic
        # eval interpolation, so forward AND the mask-regenerating
        # backward stay correct with no separate code path.
        if eval_zoneout:
            mc = jnp.full((B, width), zc, jnp.float32) if zc > 0.0 else None
            mh = jnp.full((B, width), zo, jnp.float32) if zo > 0.0 else None
            return mc, mh
        mc = draw_mask((B, width), zc_bits) if zc > 0.0 else None
        mh = draw_mask((B, width), zo_bits) if zo > 0.0 else None
        return mc, mh

    return seed_step, zoneout_masks


def _make_ls_fns(cfg, refs):
    """Location-sensitive attention features as ONE MXU matmul.

    The reference computes ``loc = Dense(Conv1d(prev_alignment))`` (a
    31-tap SAME conv to 32 channels, then a dense to score units —
    models/attention.py LocationSensitiveAttention). Both maps are linear,
    so the kernel folds them into a single (LSK, A1) matrix
    ``W = conv_kernel · location_layer`` (computed OUTSIDE the custom_vjp
    in the wrapper, so autodiff distributes d_W back to the real conv /
    dense params) and evaluates ``loc = TAP @ W + bias_vec`` where TAP is
    the (K_pad, B·S) matrix of shifted alignments. TAP lives TAP-MAJOR —
    scratch shape (K_pad, B, S) — so each tap is ONE whole-tile store at a
    static leading index; the r4 (B, S, K_pad) layout stored one LANE of
    every tile per tap (a masked read-modify-write of the whole scratch,
    ×31 taps ×(fwd + bwd-recompute) per step), which profiling attributed
    as the bulk of the LS family's 4.8× training-step overhead
    (BASELINE.md §Round 5). The matmul contracts the leading K_pad dim
    (TN form — the probe-verified lowering used by d_lsW since r4) and
    rides the MXU — vs ~28 M VPU MACs/step for the broadcast-MAC form the
    AR kernel used in r3 (fused_decode.py ls_features).
    """
    B, S = cfg["batch"], cfg["src_len"]
    LSK = cfg["ls_kernel"]
    KP = _ls_kpad(cfg)
    A1 = cfg["att1_units"]
    io_dtype = jnp.bfloat16 if cfg["io_dtype"] == "bfloat16" else jnp.float32
    tap_ref = refs["ls_tap"]
    tap_major = _ls_tap_major(cfg)

    def zero_tap():
        # padding rows/lanes LSK..KP must be exact zeros once per launch:
        # VMEM scratch garbage can be NaN, and NaN·0 from the zero-padded
        # W rows would still poison the matmul
        tap_ref[:] = jnp.zeros(tap_ref.shape, jnp.float32)

    def build_tap(prev):
        """TAP[k, :, s] (tap-major) or TAP[:, s, k] = prev[:, s + k − LSK//2],
        zero outside [0, S)."""
        col = jax.lax.broadcasted_iota(jnp.int32, (B, S), 1)
        half = LSK // 2
        for k in range(LSK):
            d = k - half
            tap = pltpu.roll(prev, (-d) % S, axis=1) if d % S else prev
            tap = jnp.where((col + d >= 0) & (col + d < S), tap, 0.0)
            if tap_major:
                tap_ref[k] = tap
            else:
                tap_ref[:, :, k] = tap

    def loc_from_tap():
        if tap_major:
            TAP = tap_ref[:].reshape(KP, B * S)
            out = jax.lax.dot_general(
                TAP.astype(io_dtype), refs["w_lsW"][:],
                (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            ).reshape(B, S, A1)
        else:
            TAP = tap_ref[:].reshape(B * S, KP)
            out = jnp.dot(
                TAP.astype(io_dtype), refs["w_lsW"][:],
                preferred_element_type=jnp.float32,
            ).reshape(B, S, A1)
        return out + refs["ls_bias"][:].astype(jnp.float32)

    return zero_tap, build_tap, loc_from_tap


def _make_step_fns(cfg, refs):
    """Build the per-step forward-compute closure over the weight refs.

    ``refs`` maps names → VMEM refs. Returns ``recompute(t, carry_in,
    feed) -> internals dict`` where ``carry_in`` is the dict of previous-
    step tensors. The PRNG must already be seeded for step t via the
    returned ``seed_step``.
    """
    B = cfg["batch"]
    S = cfg["src_len"]
    dual = cfg["dual"]
    use_ta = cfg["use_ta"]
    SPK = cfg["spk_dim"]
    io_dtype = jnp.bfloat16 if cfg["io_dtype"] == "bfloat16" else jnp.float32
    A1 = cfg["att1_units"]
    a_tot = A1 + (cfg["att2_units"] if dual else 0)

    seed_step, zoneout_masks = _make_mask_fns(cfg)
    if _is_ls(cfg):
        _, build_tap, loc_from_tap = _make_ls_fns(cfg, refs)

    def lstm_fwd(xh, w_ref, b_ref, c_prev, h_prev, mc, mh):
        z = jnp.dot(
            xh.astype(io_dtype), w_ref[:], preferred_element_type=jnp.float32
        ) + b_ref[:].astype(jnp.float32)
        u = z.shape[-1] // 4
        i, g, f, o = z[:, :u], z[:, u : 2 * u], z[:, 2 * u : 3 * u], z[:, 3 * u :]
        si, tg, sf, so = _sigmoid(i), jnp.tanh(g), _sigmoid(f + 1.0), _sigmoid(o)
        c_new = sf * c_prev + si * tg
        tc = jnp.tanh(c_new)
        h_new = so * tc
        c_out = c_prev * mc + c_new * (1.0 - mc) if mc is not None else c_new
        h_out = h_prev * mh + h_new * (1.0 - mh) if mh is not None else h_new
        return dict(
            z=z, si=si, tg=tg, sf=sf, so=so, c_new=c_new, tc=tc, h_new=h_new,
            c_out=c_out, h_out=h_out, mc=mc, mh=mh, xh=xh,
        )

    def recompute(t, cin, feed):
        """cin: dict with c_att,h_att,c1,h1,c2,h2,ctx1[,ctx2],alpha,u.

        ``feed`` is the already-prenet-ed x2 row for step t: the prenet
        depends only on the (known-ahead) teacher frames, so it runs as
        one batched (B·N) matmul pair outside the kernel — two fewer
        sequential MXU calls per decoder step (teacher_decode)."""
        it = {}
        x2 = feed.astype(jnp.float32)
        it.update(x2=x2)

        spk = [refs["spk"][:].astype(jnp.float32)] if SPK else []
        ctx2_in = [cin["ctx2"]] if dual else []
        att_in = jnp.concatenate([x2, *spk, cin["ctx1"], *ctx2_in, cin["h_att"]], axis=-1)
        mz_att = zoneout_masks(cfg["att_units"])
        att = lstm_fwd(
            att_in, refs["w_attg"], refs["b_attg"], cin["c_att"], cin["h_att"], *mz_att
        )
        query = att["h_out"]
        it.update(att=att, att_in=att_in)

        qp = jnp.dot(
            query.astype(io_dtype), refs["w_qp"][:],
            preferred_element_type=jnp.float32,
        )
        pre = refs["keys"][:].astype(jnp.float32) + qp[:, None, :]
        if _is_ls(cfg):
            build_tap(cin["cum"] if cfg["ls_cumulative"] else cin["alpha"])
            loc = loc_from_tap()
            if dual:
                loc = jnp.pad(loc, ((0, 0), (0, 0), (0, a_tot - A1)))
            pre = pre + loc
        tq = jnp.tanh(pre)
        # ONE thin matmul for both sources' scores (lane reductions against
        # padded score vectors measured SLOWER in the forward direction —
        # 15.4 vs 13.6 µs/step: two broadcast-reduce passes re-read tq)
        e2d = jnp.dot(
            tq.reshape(B * S, a_tot), refs["vblk"][:].astype(jnp.float32),
            preferred_element_type=jnp.float32,
        )
        e1 = e2d[:, 0:1].reshape(B, S) + refs["score_bias"][:]
        y1 = jax.nn.softmax(e1, axis=-1)
        if _is_ls(cfg):
            # location-sensitive source 1: plain softmax alignments; the
            # recursion state is the (cumulative) alignment the conv reads
            alpha1 = y1
            if cfg["ls_cumulative"]:
                it["cum_new"] = cin["cum"] + alpha1
        else:
            shifted = pltpu.roll(cin["alpha"], 1, axis=1)
            col = jax.lax.broadcasted_iota(jnp.int32, (B, S), 1)
            shifted = jnp.where(col == 0, 0.0, shifted)
            w_rec = (1.0 - cin["u"]) * cin["alpha"] + cin["u"] * shifted + _EPS
            alpha_hat = w_rec * y1
            s_hat = jnp.sum(alpha_hat, axis=-1, keepdims=True)
            alpha1 = alpha_hat / s_hat
            it.update(shifted=shifted, w_rec=w_rec, s_hat=s_hat)
        ctx1 = jnp.sum(alpha1[:, :, None] * refs["mem1"][:].astype(jnp.float32), axis=1)
        it.update(
            qp=qp, tq=tq, y1=y1, alpha1=alpha1, ctx1=ctx1, query=query,
        )

        if use_ta:
            ta_in = jnp.concatenate([ctx1, query], axis=-1)
            u_pre = jnp.dot(
                ta_in.astype(io_dtype), refs["w_ta"][:],
                preferred_element_type=jnp.float32,
            ) + refs["b_ta"][:].astype(jnp.float32)
            u_new = _sigmoid(u_pre)
            it.update(ta_in=ta_in, u_new=u_new)
        else:
            it["u_new"] = cin["u"]

        if dual:
            e2 = e2d[:, 1:2].reshape(B, S) + refs["score_bias"][:]
            alpha2 = jax.nn.softmax(e2, axis=-1)
            ctx2 = jnp.sum(
                alpha2[:, :, None] * refs["mem2"][:].astype(jnp.float32), axis=1
            )
            it.update(alpha2=alpha2, ctx2=ctx2)

        din1 = jnp.concatenate(
            [query, ctx1, *([it["ctx2"]] if dual else []), cin["h1"]], axis=-1
        )
        mz1 = zoneout_masks(cfg["dec_units"])
        l1 = lstm_fwd(din1, refs["w_l1"], refs["b_l1"], cin["c1"], cin["h1"], *mz1)
        din2 = jnp.concatenate([l1["h_out"], cin["h2"]], axis=-1)
        mz2 = zoneout_masks(cfg["dec_units"])
        l2 = lstm_fwd(din2, refs["w_l2"], refs["b_l2"], cin["c2"], cin["h2"], *mz2)
        it.update(l1=l1, l2=l2, din1=din1, din2=din2)
        it["feature"] = l1["h_out"] + l2["h_out"]
        return it

    return recompute, seed_step


# --------------------------------------------------------------------------- #
# Forward kernel
# --------------------------------------------------------------------------- #

_FWD_REF_NAMES = (
    # "feeds" carries the PRENET OUTPUT stack (N, B, P2): the prenet is
    # hoisted outside the kernel (it reads only teacher frames)
    "feeds", "spk", "score_bias", "keys", "mem1", "mem2",
    "w_attg", "b_attg", "w_qp", "vblk", "w_ta", "b_ta",
    "w_l1", "b_l1", "w_l2", "b_l2",
    # per-source score vectors (1, 1, a_tot), derived from vblk: the
    # BACKWARD backprops the scores as outer-product broadcasts (the
    # round-2 (B·S, n_src) matmul's shape-casts don't lower under the
    # acts-derived layouts); the forward keeps the single thin matmul,
    # which measured FASTER than lane reductions (13.6 vs 15.4 µs/step)
    "vcol1", "vcol2",
    # location-sensitive attention: folded conv·dense matrix (K_pad, A1)
    # and its bias vector (A1,) — zeros when src1_kind == "forward"
    "w_lsW", "ls_bias",
)


def _make_fwd_kernel(cfg):
    B, S, N = cfg["batch"], cfg["src_len"], cfg["num_steps"]
    AU, DU = cfg["att_units"], cfg["dec_units"]
    dual = cfg["dual"]
    layout, c_pad = _carry_layout(cfg)
    alayout, a_pad = _acts_layout(cfg)
    align_w = (2 if dual else 1) * S
    align_pad = _ceil128(align_w)
    stochastic = _needs_prng(cfg)

    ls = _is_ls(cfg)
    ls_cum = _ls_carries_cum(cfg)

    def kernel(seed_ref, *args):
        refs = dict(zip(_FWD_REF_NAMES, args[: len(_FWD_REF_NAMES)]))
        rest = args[len(_FWD_REF_NAMES):]
        feat_out, align_out, carry_hbm, acts_hbm = rest[0], rest[1], rest[2], rest[3]
        carry_row, carry_sem, acts_row, acts_sem = rest[4], rest[5], rest[6], rest[7]
        if ls:
            refs["ls_tap"] = rest[8]
            zero_tap, _, _ = _make_ls_fns(cfg, refs)
            zero_tap()
        recompute, seed_step = _make_step_fns(cfg, refs)
        width_total = max(off + w for off, w in layout.values())
        a_width = max(off + w for off, w in alayout.values())

        def pack_carry(slot, cout):
            row = jnp.concatenate(
                [cout[name] for name in layout], axis=-1
            )
            carry_row[slot] = jnp.pad(row, ((0, 0), (0, c_pad - width_total)))

        def pack_acts(slot, it):
            vals = dict(
                z_att=it["att"]["z"], z1=it["l1"]["z"], z2=it["l2"]["z"],
                qp=it["qp"], y1=it["y1"],
            )
            if dual:
                vals["alpha2"] = it["alpha2"]
            row = jnp.concatenate([vals[name] for name in alayout], axis=-1)
            acts_row[slot] = jnp.pad(row, ((0, 0), (0, a_pad - a_width)))

        carry_names = (
            "c_att", "h_att", "c1", "h1", "c2", "h2", "ctx1", "ctx2",
            "alpha", "u",
        ) + (("cum",) if ls_cum else ())

        def step(t, carry):
            cin = dict(zip(carry_names, carry))
            if stochastic:
                seed_step(seed_ref[0] + t)
            feed = refs["feeds"][t]
            it = recompute(t, cin, feed)

            feat_out[t] = it["feature"]
            arow = (
                jnp.concatenate([it["alpha1"], it["alpha2"]], axis=-1)
                if dual else it["alpha1"]
            )
            align_out[t] = jnp.pad(
                arow, ((0, 0), (0, align_pad - align_w))
            )

            cout = dict(
                c_att=it["att"]["c_out"], h_att=it["att"]["h_out"],
                c1=it["l1"]["c_out"], h1=it["l1"]["h_out"],
                c2=it["l2"]["c_out"], h2=it["l2"]["h_out"],
                ctx1=it["ctx1"], alpha=it["alpha1"], u=it["u_new"],
            )
            if dual:
                cout["ctx2"] = it["ctx2"]
            if ls_cum:
                cout["cum"] = it["cum_new"]

            # 2-slot rings: wait for the copies issued 2 steps ago, refill
            slot = jax.lax.rem(t, 2)

            @pl.when(t >= 2)
            def _():
                pltpu.make_async_copy(
                    carry_row.at[pl.ds(slot, 1)],
                    carry_hbm.at[pl.ds(t - 2, 1)],
                    carry_sem.at[slot],
                ).wait()
                pltpu.make_async_copy(
                    acts_row.at[pl.ds(slot, 1)],
                    acts_hbm.at[pl.ds(t - 2, 1)],
                    acts_sem.at[slot],
                ).wait()

            pack_carry(slot, cout)
            pltpu.make_async_copy(
                carry_row.at[pl.ds(slot, 1)],
                carry_hbm.at[pl.ds(t, 1)],
                carry_sem.at[slot],
            ).start()
            pack_acts(slot, it)
            pltpu.make_async_copy(
                acts_row.at[pl.ds(slot, 1)],
                acts_hbm.at[pl.ds(t, 1)],
                acts_sem.at[slot],
            ).start()

            return tuple(
                cout.get(name, carry[i]) for i, name in enumerate(carry_names)
            )

        z = lambda *shape: jnp.zeros(shape, jnp.float32)
        init_alpha = _init_alpha(cfg)
        e2w = cfg["mem2_dim"] if dual else 1
        init = (
            z(B, AU), z(B, AU), z(B, DU), z(B, DU), z(B, DU), z(B, DU),
            z(B, cfg["mem1_dim"]), z(B, e2w),
            init_alpha, jnp.full((B, 1), 0.5, jnp.float32),
        ) + ((z(B, S),) if ls_cum else ())
        jax.lax.fori_loop(0, N, step, init)

        # drain the rings (N is static)
        for slot in range(min(N, 2)):
            pltpu.make_async_copy(
                carry_row.at[slot : slot + 1],
                carry_hbm.at[pl.ds(0, 1)],
                carry_sem.at[slot],
            ).wait()
            pltpu.make_async_copy(
                acts_row.at[slot : slot + 1],
                acts_hbm.at[pl.ds(0, 1)],
                acts_sem.at[slot],
            ).wait()

    return kernel, c_pad, align_pad


# --------------------------------------------------------------------------- #
# Backward kernel
# --------------------------------------------------------------------------- #

_BWD_EXTRA_REF_NAMES = (
    # transposed weights for input-gradient matmuls (precomputed host-side)
    "w_attgT", "w_qpT", "w_taT", "w_l1T", "w_l2T",
    "w_lsWT",
)

_GRAD_NAMES = ("d_keys", "d_vblk", "d_spk", "d_lsW", "d_lsbias", "d_brow")


def _stack_layout(cfg):
    """Per-step gradient-stack row layout (exported to HBM).

    Weight gradients are NOT accumulated in-kernel: the per-step
    contractions are only B deep (MXU-underutilized) and the f32
    accumulators cost ~21 MB of VMEM traffic per step. Instead the
    backward exports these per-step gradient vectors (plus the two
    prenet activations that are not in the carries) and the wrapper
    batches every weight-grad matmul outside the kernel as ONE
    (N·B)-deep MXU contraction against inputs reconstructed from the
    carries residual.
    """
    P2 = cfg["prenet_units"][1]
    AU, DU = cfg["att_units"], cfg["dec_units"]
    E1 = cfg["mem1_dim"]
    E2 = cfg["mem2_dim"] if cfg["dual"] else 0
    fields = [
        ("g_z_att", 4 * AU), ("g_z1", 4 * DU), ("g_z2", 4 * DU),
        # cotangent of the hoisted prenet's output (the kernel's feeds
        # input); the outside-kernel prenet backprops through it
        ("g_feed", P2),
        ("g_qp", cfg["att1_units"] + (cfg["att2_units"] if cfg["dual"] else 0)),
        ("g_ctx1", E1),
    ]
    if cfg["dual"]:
        fields.append(("g_ctx2", E2))
    if cfg["use_ta"]:
        fields.append(("g_u_pre", 1))
    layout = {}
    off = 0
    for name, width in fields:
        layout[name] = (off, width)
        off += width
    return layout, _ceil128(off)


def _make_bwd_kernel(cfg):
    B, S, N = cfg["batch"], cfg["src_len"], cfg["num_steps"]
    AU, DU = cfg["att_units"], cfg["dec_units"]
    dual = cfg["dual"]
    use_ta = cfg["use_ta"]
    SPK = cfg["spk_dim"]
    P2 = cfg["prenet_units"][1]
    A1 = cfg["att1_units"]
    a_tot = A1 + (cfg["att2_units"] if dual else 0)
    E1 = cfg["mem1_dim"]
    E2 = cfg["mem2_dim"] if dual else 0
    layout, c_pad = _carry_layout(cfg)
    alayout, a_pad = _acts_layout(cfg)
    slayout, k_pad = _stack_layout(cfg)
    s_width = max(off + w for off, w in slayout.values())
    align_w = (2 if dual else 1) * S
    stochastic = _needs_prng(cfg)
    io_dtype = jnp.bfloat16 if cfg["io_dtype"] == "bfloat16" else jnp.float32

    def kernel(seed_ref, *args):
        refs = dict(zip(_FWD_REF_NAMES, args[: len(_FWD_REF_NAMES)]))
        pos = len(_FWD_REF_NAMES)
        for name in _BWD_EXTRA_REF_NAMES:
            refs[name] = args[pos]
            pos += 1
        g_feat_ref = args[pos]; pos += 1      # (N, B, DU) f32 VMEM
        g_align_ref = args[pos]; pos += 1     # (N, B, align_pad) f32 VMEM
        carry_hbm = args[pos]; pos += 1       # (N, B, c_pad) f32 ANY
        acts_hbm = args[pos]; pos += 1        # (N, B, a_pad) f32 ANY
        grads = dict(zip(_GRAD_NAMES, args[pos : pos + len(_GRAD_NAMES)]))
        pos += len(_GRAD_NAMES)
        stack_hbm = args[pos]; pos += 1       # (N, B, k_pad) f32 ANY out
        (carry_buf, carry_sem, acts_buf, acts_sem,
         canon_y1, canon_a2, canon_qp, canon_tq, canon_red,
         stack_row, stack_sem) = args[pos : pos + 11]
        pos += 11
        ls = _is_ls(cfg)
        ls_cum = _ls_carries_cum(cfg)
        KP = _ls_kpad(cfg)
        ls_g = ls_gtap = None
        if ls:
            refs["ls_tap"] = args[pos]
            ls_g = args[pos + 1]
            ls_gtap = args[pos + 2]
            zero_tap, build_tap, loc_from_tap = _make_ls_fns(cfg, refs)
            zero_tap()

        seed_step, zoneout_masks = _make_mask_fns(cfg)

        # zero the accumulators
        for name in _GRAD_NAMES:
            grads[name][:] = jnp.zeros(grads[name].shape, jnp.float32)

        def lstm_bwd(it, g_c_out, g_h_out, c_prev, w_T):
            """Returns (g_z, g_xh, g_c_prev, g_h_prev); the weight grad is
            batched outside the kernel from the exported g_z stack."""
            mc, mh = it["mc"], it["mh"]
            if mc is not None:
                g_c_new = g_c_out * (1.0 - mc)
                g_c_prev = g_c_out * mc
            else:
                g_c_new, g_c_prev = g_c_out, jnp.zeros_like(g_c_out)
            if mh is not None:
                g_h_new = g_h_out * (1.0 - mh)
                g_h_prev = g_h_out * mh
            else:
                g_h_new, g_h_prev = g_h_out, jnp.zeros_like(g_h_out)

            so, tc, sf, si, tg = it["so"], it["tc"], it["sf"], it["si"], it["tg"]
            g_o_pre = g_h_new * tc * so * (1.0 - so)
            g_c_new = g_c_new + g_h_new * so * (1.0 - tc * tc)
            g_f_pre = g_c_new * c_prev * sf * (1.0 - sf)
            g_c_prev = g_c_prev + g_c_new * sf
            g_i_pre = g_c_new * tg * si * (1.0 - si)
            g_g_pre = g_c_new * si * (1.0 - tg * tg)
            g_z = jnp.concatenate([g_i_pre, g_g_pre, g_f_pre, g_o_pre], axis=-1)
            g_xh = jnp.dot(
                g_z.astype(io_dtype), w_T[:], preferred_element_type=jnp.float32
            )
            return g_z, g_xh, g_c_prev, g_h_prev

        def softmax_bwd(a, g_a):
            return a * (g_a - jnp.sum(g_a * a, axis=-1, keepdims=True))

        def lstm_vals(z, c_prev, mz):
            """Gate values from the exported pre-activations (no matmul)."""
            u = z.shape[-1] // 4
            i_, g_ = z[:, :u], z[:, u : 2 * u]
            f_, o_ = z[:, 2 * u : 3 * u], z[:, 3 * u :]
            si, tg = _sigmoid(i_), jnp.tanh(g_)
            sf, so = _sigmoid(f_ + 1.0), _sigmoid(o_)
            c_new = sf * c_prev + si * tg
            tc = jnp.tanh(c_new)
            return dict(
                z=z, si=si, tg=tg, sf=sf, so=so, c_new=c_new, tc=tc,
                mc=mz[0], mh=mz[1],
            )

        def step(i, carry_grads):
            t = N - 1 - i
            (g_c_att, g_h_att, g_c1, g_h1, g_c2, g_h2,
             g_ctx1_c, g_ctx2_c, g_alpha_c, g_u_c) = carry_grads

            # fetch carries[t−1] (slot 0; init state replaces it at t=0),
            # carries[t] (slot 1), and the step's activation row. Static
            # buffer slots: Mosaic cannot lower dynamic leading-index VMEM
            # loads, and where-selected rows trip relayout inference. All
            # three copies are issued before any wait so the DMA latency
            # is paid once, not three times.
            @pl.when(t > 0)
            def _():
                pltpu.make_async_copy(
                    carry_hbm.at[pl.ds(t - 1, 1)],
                    carry_buf.at[pl.ds(0, 1)],
                    carry_sem.at[0],
                ).start()

            pltpu.make_async_copy(
                carry_hbm.at[pl.ds(t, 1)], carry_buf.at[pl.ds(1, 1)],
                carry_sem.at[0],
            ).start()
            pltpu.make_async_copy(
                acts_hbm.at[pl.ds(t, 1)], acts_buf.at[pl.ds(0, 1)],
                acts_sem.at[0],
            ).start()

            @pl.when(t > 0)
            def _():
                pltpu.make_async_copy(
                    carry_hbm.at[pl.ds(t - 1, 1)],
                    carry_buf.at[pl.ds(0, 1)],
                    carry_sem.at[0],
                ).wait()

            pltpu.make_async_copy(
                carry_hbm.at[pl.ds(t, 1)], carry_buf.at[pl.ds(1, 1)],
                carry_sem.at[0],
            ).wait()
            pltpu.make_async_copy(
                acts_hbm.at[pl.ds(t, 1)], acts_buf.at[pl.ds(0, 1)],
                acts_sem.at[0],
            ).wait()

            prev_row = carry_buf[0]
            cur_row = carry_buf[1]
            acts_row_v = acts_buf[0]
            t_is0 = (t == 0)

            def unpack(name):
                off, width = layout[name]
                return prev_row[:, off : off + width]

            def cur(name):
                off, width = layout[name]
                return cur_row[:, off : off + width]

            def acts(name):
                off, width = alayout[name]
                return acts_row_v[:, off : off + width]

            init_alpha = _init_alpha(cfg)
            zsel = lambda v: jnp.where(t_is0, jnp.zeros_like(v), v)
            cin = dict(
                c_att=zsel(unpack("c_att")), h_att=zsel(unpack("h_att")),
                c1=zsel(unpack("c1")), h1=zsel(unpack("h1")),
                c2=zsel(unpack("c2")), h2=zsel(unpack("h2")),
                ctx1=zsel(unpack("ctx1")),
                alpha=jnp.where(t_is0, init_alpha, unpack("alpha")),
                u=jnp.where(t_is0, jnp.full((B, 1), 0.5, jnp.float32), unpack("u")),
            )
            if dual:
                cin["ctx2"] = zsel(unpack("ctx2"))
            if ls_cum:
                cin["cum"] = zsel(unpack("cum"))

            # masks regenerate in the forward's exact draw order
            if stochastic:
                seed_step(seed_ref[0] + t)
            mz_att = zoneout_masks(AU)
            mz1 = zoneout_masks(DU)
            mz2 = zoneout_masks(DU)

            # canonicalize the slices that feed reshapes/broadcasts: a
            # store/load round-trip through a scratch ref forces the
            # canonical tiled layout (raw row-offset layouts trip Mosaic's
            # relayout inference in the (B,S)→(B·S,1) reshape and the
            # qp[:, None, :] broadcast)
            canon_y1[:] = acts("y1")
            canon_qp[:] = acts("qp")
            if dual:
                canon_a2[:] = acts("alpha2")

            # the step's internals, from exports instead of recompute: the
            # only recomputed tensor is the (B, S, A) score tanh
            it = dict(
                att=lstm_vals(acts("z_att"), cin["c_att"], mz_att),
                l1=lstm_vals(acts("z1"), cin["c1"], mz1),
                l2=lstm_vals(acts("z2"), cin["c2"], mz2),
                y1=canon_y1[:], alpha1=cur("alpha"), u_new=cur("u"),
            )
            if not ls:
                shifted = pltpu.roll(cin["alpha"], 1, axis=1)
                colS = jax.lax.broadcasted_iota(jnp.int32, (B, S), 1)
                shifted = jnp.where(colS == 0, 0.0, shifted)
                w_rec = (1.0 - cin["u"]) * cin["alpha"] + cin["u"] * shifted + _EPS
                it.update(
                    shifted=shifted, w_rec=w_rec,
                    s_hat=jnp.sum(w_rec * it["y1"], axis=-1, keepdims=True),
                )
            # the one recomputed tensor: the (B, S, A) score tanh, stored
            # to scratch so downstream broadcasts see a canonical layout
            score_pre = (
                refs["keys"][:].astype(jnp.float32) + canon_qp[:][:, None, :]
            )
            if ls:
                # TAP stays resident in the ls_tap scratch through the
                # scores backward (g_W accumulation reads it)
                build_tap(cin["cum"] if cfg["ls_cumulative"] else cin["alpha"])
                loc = loc_from_tap()
                if dual:
                    loc = jnp.pad(loc, ((0, 0), (0, 0), (0, a_tot - A1)))
                score_pre = score_pre + loc
            canon_tq[:] = jnp.tanh(score_pre)
            if dual:
                it["alpha2"] = canon_a2[:]

            # ---- gradients flowing into this step's outputs ----
            gf = g_feat_ref[t]
            g_h1_out = g_h1 + gf
            g_h2_out = g_h2 + gf
            g_alpha1_tot = g_alpha_c + g_align_ref[t][:, :S]
            g_alpha2_ext = g_align_ref[t][:, S : 2 * S] if dual else None

            # ---- LSTM2 ----
            g_z2, g_din2, g_c2_prev, g_h2_prev = lstm_bwd(
                it["l2"], g_c2, g_h2_out, cin["c2"], refs["w_l2T"]
            )
            g_h1_out = g_h1_out + g_din2[:, :DU]
            g_h2_prev = g_h2_prev + g_din2[:, DU:]

            # ---- LSTM1 ----
            g_z1, g_din1, g_c1_prev, g_h1_prev = lstm_bwd(
                it["l1"], g_c1, g_h1_out, cin["c1"], refs["w_l1T"]
            )
            g_query = g_din1[:, :AU]
            g_ctx1 = g_ctx1_c + g_din1[:, AU : AU + E1]
            if dual:
                g_ctx2 = g_ctx2_c + g_din1[:, AU + E1 : AU + E1 + E2]
                g_h1_prev = g_h1_prev + g_din1[:, AU + E1 + E2 :]
            else:
                g_ctx2 = g_ctx2_c
                g_h1_prev = g_h1_prev + g_din1[:, AU + E1 :]

            # ---- transition agent (u_t consumed at step t+1 → g_u_c) ----
            if use_ta:
                u_new = it["u_new"]
                g_u_pre = g_u_c * u_new * (1.0 - u_new)
                g_ta = jnp.dot(
                    g_u_pre.astype(io_dtype), refs["w_taT"][:],
                    preferred_element_type=jnp.float32,
                )
                g_ctx1 = g_ctx1 + g_ta[:, :E1]
                g_query = g_query + g_ta[:, E1:]
                g_u_pass = jnp.zeros((B, 1), jnp.float32)
            else:
                g_u_pass = g_u_c  # u passes through unchanged

            # ---- additive attention #2 ----
            if dual:
                mem2f = refs["mem2"][:].astype(jnp.float32)
                g_alpha2 = jnp.sum(g_ctx2[:, None, :] * mem2f, axis=-1)
                if g_alpha2_ext is not None:
                    g_alpha2 = g_alpha2 + g_alpha2_ext
                g_e2 = softmax_bwd(it["alpha2"], g_alpha2)
            else:
                g_e2 = None

            # ---- context 1 + source-1 recursion adjoint ----
            mem1f = refs["mem1"][:].astype(jnp.float32)
            g_alpha1_tot = g_alpha1_tot + jnp.sum(
                g_ctx1[:, None, :] * mem1f, axis=-1
            )
            if ls:
                # location-sensitive: α₁ = y₁ directly; the recursion into
                # the previous (cumulative) alignment flows through the
                # conv taps and is resolved after the scores backward
                g_u_prev = g_u_pass
                g_alpha_prev = None  # set below (needs g_pre)
                g_e1 = softmax_bwd(it["y1"], g_alpha1_tot)
            else:
                g_ahat = (
                    g_alpha1_tot
                    - jnp.sum(g_alpha1_tot * it["alpha1"], axis=-1, keepdims=True)
                ) / it["s_hat"]
                g_y1 = g_ahat * it["w_rec"]
                g_w = g_ahat * it["y1"]
                g_u_rec = jnp.sum(
                    g_w * (it["shifted"] - cin["alpha"]), axis=-1, keepdims=True
                )
                g_u_prev = g_u_pass + g_u_rec
                gwu = g_w * cin["u"]
                col = jax.lax.broadcasted_iota(jnp.int32, (B, S), 1)
                # adjoint of the zero-filled right-shift: left-shift with zero
                # at the last column (roll by S-1 == roll by -1)
                unshift = jnp.where(col == S - 1, 0.0, pltpu.roll(gwu, S - 1, axis=1))
                g_alpha_prev = g_w * (1.0 - cin["u"]) + unshift
                g_e1 = softmax_bwd(it["y1"], g_y1)

            # ---- fused scores backward ----
            # outer-product broadcasts instead of the round-2 (B·S, n_src)
            # thin matmuls: with acts-derived layouts Mosaic cannot shape-
            # cast (B, S) → (B·S, 1), and the width-≤2 matmuls were MXU-
            # hostile anyway. Only broadcast patterns proven elsewhere in
            # these kernels are used — (1,1,A)/(B,1,A) against a canonical
            # 3D value, and (B,S,1) against a canonical 3D value (the
            # context-reduction pattern); tq is canonical via the scratch.
            tq = canon_tq[:]                                  # (B, S, a_tot)
            one_m_tq2 = 1.0 - tq * tq
            v1r = refs["vcol1"][:].astype(jnp.float32)        # (1, 1, a_tot)
            g_pre = g_e1[:, :, None] * (v1r * one_m_tq2)
            if dual:
                v2r = refs["vcol2"][:].astype(jnp.float32)
                g_pre = g_pre + g_e2[:, :, None] * (v2r * one_m_tq2)
            grads["d_keys"][:] = grads["d_keys"][:] + g_pre
            # staged reductions: a sum(3D, axis=1) result carries an
            # implicit-dim layout that cannot feed another reduce or the
            # stack concat directly — round-trip through scratch. canon_qp
            # is free for reuse once tq is built.
            canon_qp[:] = jnp.sum(g_pre, axis=1)
            g_qp = canon_qp[:]
            # d_vblk rows (n_src, a_tot): Σ_{b,s} tq · g_e per source
            canon_red[:] = jnp.sum(g_e1[:, :, None] * tq, axis=1)
            grads["d_vblk"][0:1, :] = grads["d_vblk"][0:1, :] + jnp.sum(
                canon_red[:], axis=0, keepdims=True
            )
            if dual:
                canon_red[:] = jnp.sum(g_e2[:, :, None] * tq, axis=1)
                grads["d_vblk"][1:2, :] = grads["d_vblk"][1:2, :] + jnp.sum(
                    canon_red[:], axis=0, keepdims=True
                )
            g_query = g_query + jnp.dot(
                g_qp.astype(io_dtype), refs["w_qpT"][:],
                preferred_element_type=jnp.float32,
            )

            if ls:
                # ---- location-feature backward ----
                # keys, qp and loc all receive the same g_pre; canonicalize
                # the A1 slice through a scratch before the 2D reshape
                ls_g[:] = g_pre[:, :, :A1] if dual else g_pre
                g_loc2d = ls_g[:].reshape(B * S, A1)
                # g_W accumulates over all N·B·S tap rows/columns: the
                # natural NN matmul when tap-major, the probe-verified TN
                # contraction on the lane-minor fallback layout
                if _ls_tap_major(cfg):
                    TAP_k2d = refs["ls_tap"][:].reshape(KP, B * S)
                    d_lsw_inc = jax.lax.dot_general(
                        TAP_k2d.astype(io_dtype), g_loc2d.astype(io_dtype),
                        (((1,), (0,)), ((), ())),
                        preferred_element_type=jnp.float32,
                    )
                else:
                    TAP2d = refs["ls_tap"][:].reshape(B * S, KP)
                    d_lsw_inc = jax.lax.dot_general(
                        TAP2d.astype(io_dtype), g_loc2d.astype(io_dtype),
                        (((0,), (0,)), ((), ())),
                        preferred_element_type=jnp.float32,
                    )
                grads["d_lsW"][:] = grads["d_lsW"][:] + d_lsw_inc
                # bias_vec is added once per (b, s): its gradient is the
                # B-sum of the already-staged Σ_s g_pre (= g_qp); the A2
                # tail is sliced off by the wrapper
                grads["d_lsbias"][:] = grads["d_lsbias"][:] + jnp.sum(
                    canon_qp[:], axis=0, keepdims=True
                )
                g_tap2d = jnp.dot(
                    g_loc2d.astype(io_dtype), refs["w_lsWT"][:],
                    preferred_element_type=jnp.float32,
                )
                # canonicalize g_TAP through its own scratch (the natural
                # NN matmul above leaves it tap-MINOR; the per-tap lane
                # LOADS below are plain reads, not the RMW stores the
                # tap-major TAP layout eliminates)
                ls_gtap[:] = g_tap2d.reshape(B, S, KP)
                colS2 = jax.lax.broadcasted_iota(jnp.int32, (B, S), 1)
                g_prev_al = jnp.zeros((B, S), jnp.float32)
                half = cfg["ls_kernel"] // 2
                for k in range(cfg["ls_kernel"]):
                    d = k - half
                    gk = ls_gtap[:, :, k]
                    # adjoint of tap_k (prev shifted by d, zero-masked):
                    # g_prev[s'] += g_tap_k[s' − d], zero where s' − d
                    # leaves [0, S)
                    rolled = pltpu.roll(gk, d % S, axis=1) if d % S else gk
                    g_prev_al = g_prev_al + jnp.where(
                        (colS2 - d >= 0) & (colS2 - d < S), rolled, 0.0
                    )
                if ls_cum:
                    # carry slot holds g_cum: cum_{t−1} takes the identity
                    # path (cum_t = cum_{t−1} + α_t) plus the conv path
                    g_alpha_prev = g_alpha_c + g_prev_al
                else:
                    g_alpha_prev = g_prev_al

            # ---- attention LSTM ----
            g_h_att_out = g_h_att + g_query
            g_z_att, g_att_in, g_c_att_prev, g_h_att_prev = lstm_bwd(
                it["att"], g_c_att, g_h_att_out, cin["c_att"], refs["w_attgT"]
            )
            off = 0
            g_feed = g_att_in[:, :P2]; off = P2
            if SPK:
                grads["d_spk"][:] = grads["d_spk"][:] + g_att_in[:, off : off + SPK]
                off += SPK
            g_ctx1_prev = g_att_in[:, off : off + E1]; off += E1
            if dual:
                g_ctx2_prev = g_att_in[:, off : off + E2]; off += E2
            else:
                g_ctx2_prev = g_ctx2_c * 0.0
            g_h_att_prev = g_h_att_prev + g_att_in[:, off:]

            # prenet backward happens OUTSIDE the kernel: g_feed (the
            # cotangent of the hoisted prenet's x2 output) exports with
            # the stacks and autodiff distributes it onto w_p1..b_p2

            # ---- export the per-step gradient-stack row ----
            svals = dict(
                g_z_att=g_z_att, g_z1=g_z1, g_z2=g_z2,
                g_feed=g_feed, g_qp=g_qp,
                g_ctx1=g_ctx1,
            )
            if dual:
                svals["g_ctx2"] = g_ctx2
            if use_ta:
                svals["g_u_pre"] = g_u_pre
            srow = jnp.concatenate([svals[n] for n in slayout], axis=-1)
            slot = jax.lax.rem(i, 2)

            @pl.when(i >= 2)
            def _():
                pltpu.make_async_copy(
                    stack_row.at[pl.ds(slot, 1)],
                    stack_hbm.at[pl.ds(t + 2, 1)],
                    stack_sem.at[slot],
                ).wait()

            srow_pad = jnp.pad(srow, ((0, 0), (0, k_pad - s_width)))
            # f32 running sum over steps — bias grads come from here, so
            # the bf16 stack rounding never touches them
            grads["d_brow"][:] = grads["d_brow"][:] + srow_pad
            stack_row[slot] = srow_pad.astype(stack_row.dtype)
            pltpu.make_async_copy(
                stack_row.at[pl.ds(slot, 1)],
                stack_hbm.at[pl.ds(t, 1)],
                stack_sem.at[slot],
            ).start()

            return (
                g_c_att_prev, g_h_att_prev, g_c1_prev, g_h1_prev,
                g_c2_prev, g_h2_prev, g_ctx1_prev, g_ctx2_prev,
                g_alpha_prev, g_u_prev,
            )

        z = lambda *shape: jnp.zeros(shape, jnp.float32)
        e2w = E2 if dual else 1
        init = (
            z(B, AU), z(B, AU), z(B, DU), z(B, DU), z(B, DU), z(B, DU),
            z(B, E1), z(B, e2w), z(B, S), z(B, 1),
        )
        jax.lax.fori_loop(0, N, step, init)
        for slot in range(min(N, 2)):
            pltpu.make_async_copy(
                stack_row.at[slot : slot + 1],
                stack_hbm.at[pl.ds(0, 1)],
                stack_sem.at[slot],
            ).wait()

    return kernel, c_pad, _ceil128(align_w)


# --------------------------------------------------------------------------- #
# pallas_call wrappers + custom VJP
# --------------------------------------------------------------------------- #


def _vmem_specs(n):
    return [pl.BlockSpec(memory_space=pltpu.VMEM)] * n


@functools.partial(jax.jit, static_argnames=("cfg_key",))
def _run_fwd(operands: Tuple, cfg_key: Tuple):
    cfg = dict(cfg_key)
    kernel, c_pad, align_pad = _make_fwd_kernel(cfg)
    _, a_pad = _acts_layout(cfg)
    B, N = cfg["batch"], cfg["num_steps"]
    DU = cfg["dec_units"]
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(),
        in_specs=_vmem_specs(len(operands) - 1),
        out_specs=(
            pl.BlockSpec(memory_space=pltpu.VMEM),   # features
            pl.BlockSpec(memory_space=pltpu.VMEM),   # alignments
            pl.BlockSpec(memory_space=pl.ANY),       # carries (HBM)
            pl.BlockSpec(memory_space=pl.ANY),       # activations (HBM)
        ),
        scratch_shapes=[
            pltpu.VMEM((2, B, c_pad), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.VMEM((2, B, a_pad), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
        ] + (
            # tap-major: whole-tile stores at a static leading index (one
            # per tap) instead of per-lane RMW of the whole scratch;
            # lane-minor fallback when S is not lane-tile aligned
            [pltpu.VMEM(
                (_ls_kpad(cfg), cfg["batch"], cfg["src_len"])
                if _ls_tap_major(cfg)
                else (cfg["batch"], cfg["src_len"], _ls_kpad(cfg)),
                jnp.float32,
            )]
            if _is_ls(cfg) else []
        ),
    )
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=(
            jax.ShapeDtypeStruct((N, B, DU), jnp.float32),
            jax.ShapeDtypeStruct((N, B, align_pad), jnp.float32),
            jax.ShapeDtypeStruct((N, B, c_pad), jnp.float32),
            jax.ShapeDtypeStruct((N, B, a_pad), jnp.float32),
        ),
        compiler_params=pltpu.CompilerParams(
            has_side_effects=True, vmem_limit_bytes=100 * 1024 * 1024
        ),
        interpret=cfg["interpret"],
    )(*operands)


@functools.partial(jax.jit, static_argnames=("cfg_key",))
def _run_bwd(operands: Tuple, cfg_key: Tuple):
    cfg = dict(cfg_key)
    kernel, c_pad, _ = _make_bwd_kernel(cfg)
    B, S, N = cfg["batch"], cfg["src_len"], cfg["num_steps"]
    A1 = cfg["att1_units"]
    dual = cfg["dual"]
    a_tot = A1 + (cfg["att2_units"] if dual else 0)
    SPK = cfg["spk_dim"]
    n_src = 2 if dual else 1
    _, k_pad = _stack_layout(cfg)

    ls = _is_ls(cfg)
    KP = _ls_kpad(cfg)
    io_np = jnp.bfloat16 if cfg["io_dtype"] == "bfloat16" else jnp.float32
    out_shapes = (
        jax.ShapeDtypeStruct((B, S, a_tot), jnp.float32),   # d_keys
        jax.ShapeDtypeStruct((n_src, a_tot), jnp.float32),  # d_vblk (rows)
        jax.ShapeDtypeStruct((B, max(SPK, 1)), jnp.float32),  # d_spk
        # d_lsW / d_lsbias (location-sensitive; minimal dummies when off)
        jax.ShapeDtypeStruct((KP if ls else 8, A1 if ls else 128), jnp.float32),
        jax.ShapeDtypeStruct((1, a_tot if ls else 128), jnp.float32),
        # d_brow: f32 accumulator of the per-step stack rows (N-sum),
        # so bias gradients keep full precision when the stack itself is
        # exported in bf16 (the wrapper B-sums it per field)
        jax.ShapeDtypeStruct((B, k_pad), jnp.float32),
        # gradient stacks in the COMPUTE dtype: every consumer (the
        # wrapper's batched weight-grad matmuls) casts to io_dtype anyway,
        # so f32 storage only bought a whole-stack HBM convert downstream
        # (measured 0.53 ms at bench shapes); bias sums accumulate in f32
        # at the reduce (wrapper bsum dtype=f32)
        jax.ShapeDtypeStruct((N, B, k_pad), io_np),         # gradient stacks
    )
    _, a_pad = _acts_layout(cfg)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(),
        in_specs=(
            _vmem_specs(len(operands) - 3)
            + [pl.BlockSpec(memory_space=pl.ANY)]   # carries (HBM)
            + [pl.BlockSpec(memory_space=pl.ANY)]   # activations (HBM)
        ),
        out_specs=(
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),  # d_lsW
            pl.BlockSpec(memory_space=pltpu.VMEM),  # d_lsbias
            pl.BlockSpec(memory_space=pltpu.VMEM),  # d_brow
            pl.BlockSpec(memory_space=pl.ANY),      # stacks (HBM)
        ),
        scratch_shapes=[
            pltpu.VMEM((2, B, c_pad), jnp.float32),
            pltpu.SemaphoreType.DMA((1,)),
            pltpu.VMEM((1, B, a_pad), jnp.float32),
            pltpu.SemaphoreType.DMA((1,)),
            pltpu.VMEM((B, S), jnp.float32),       # canonical y1
            pltpu.VMEM((B, S), jnp.float32),       # canonical alpha2
            pltpu.VMEM((B, a_tot), jnp.float32),   # canonical qp
            pltpu.VMEM((B, S, a_tot), jnp.float32),  # canonical score tanh
            pltpu.VMEM((B, a_tot), jnp.float32),     # staged reductions
            pltpu.VMEM((2, B, k_pad), io_np),        # stack DMA ring
            pltpu.SemaphoreType.DMA((2,)),
        ] + (
            [
                pltpu.VMEM(
                    (KP, B, S) if _ls_tap_major(cfg) else (B, S, KP),
                    jnp.float32,
                ),                                     # TAP
                pltpu.VMEM((B, S, A1), jnp.float32),   # canonical g_loc
                pltpu.VMEM((B, S, KP), jnp.float32),   # canonical g_TAP
            ]
            if ls else []
        ),
    )
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=out_shapes,
        compiler_params=pltpu.CompilerParams(
            has_side_effects=True, vmem_limit_bytes=100 * 1024 * 1024
        ),
        interpret=cfg["interpret"],
    )(*operands)


def _weights_to_operands(weights: Dict, io):
    """Fixed order matching _FWD_REF_NAMES[6:]."""
    return (
        io(weights["w_attg"]), io(weights["b_attg"]),
        io(weights["w_qp"]), io(weights["vblk"]),
        io(weights["w_ta"]), io(weights["b_ta"]),
        io(weights["w_l1"]), io(weights["b_l1"]),
        io(weights["w_l2"]), io(weights["b_l2"]),
    )


@functools.partial(jax.custom_vjp, nondiff_argnums=(0,))
def _teacher_decode(cfg_key, weights, conds, feeds, seed):
    out, _ = _teacher_decode_fwd(cfg_key, weights, conds, feeds, seed)
    return out


def _ls_w_padded(cfg, weights):
    """(LSK, A1) folded location matrix → (K_pad, A1) zero-padded rows."""
    w = jnp.asarray(weights["w_lsW"], jnp.float32)
    return jnp.pad(w, ((0, _ls_kpad(cfg) - w.shape[0]), (0, 0)))


def _common_operands(cfg, weights, conds, feeds, seed):
    io = (
        (lambda x: jnp.asarray(x, jnp.bfloat16))
        if cfg["io_dtype"] == "bfloat16"
        else (lambda x: jnp.asarray(x, jnp.float32))
    )
    B = cfg["batch"]
    spk = conds.get("spk")
    mem2 = conds.get("mem2")
    # per-source score vectors from the (a_tot, n_src) block matrix
    vblk_f = jnp.asarray(weights["vblk"], jnp.float32)
    a_tot = vblk_f.shape[0]
    vcol1 = jnp.transpose(vblk_f[:, 0:1]).reshape(1, 1, a_tot)
    vcol2 = (
        jnp.transpose(vblk_f[:, 1:2]).reshape(1, 1, a_tot)
        if vblk_f.shape[1] > 1
        else jnp.zeros_like(vcol1)
    )
    if _is_ls(cfg):
        w_lsW = io(_ls_w_padded(cfg, weights))
        ls_bias = jnp.asarray(weights["ls_bias"], jnp.float32)
    else:
        w_lsW = jnp.zeros((8, 8), jnp.float32)
        ls_bias = jnp.zeros((cfg["att1_units"],), jnp.float32)
    return (
        jnp.asarray(seed, jnp.int32).reshape(1),
        io(jnp.transpose(feeds, (1, 0, 2))),                  # (N, B, F)
        io(spk) if spk is not None else jnp.zeros((B, 1), jnp.bfloat16),
        jnp.asarray(conds["score_bias"], jnp.float32),
        io(conds["keys"]),
        io(conds["mem1"]),
        io(mem2) if mem2 is not None else jnp.zeros((8, 8, 128), jnp.bfloat16),
    ) + _weights_to_operands(weights, io) + (vcol1, vcol2, w_lsW, ls_bias)


def _teacher_decode_fwd(cfg_key, weights, conds, feeds, seed):
    cfg = dict(cfg_key)
    operands = _common_operands(cfg, weights, conds, feeds, seed)
    features, aligns, carries, acts = _run_fwd(operands, cfg_key)
    S = cfg["src_len"]
    n_src = 2 if cfg["dual"] else 1
    aligns = aligns[..., : n_src * S]
    out = (features, aligns)
    # aligns are residuals too: the outside-batched d_mem einsums use the
    # per-step alignment stacks (bitwise equal to the forward's values)
    return out, (weights, conds, feeds, seed, carries, acts, aligns)


def _teacher_decode_bwd(cfg_key, residuals, cotangents):
    cfg = dict(cfg_key)
    weights, conds, feeds, seed, carries, acts, aligns = residuals
    g_feat, g_align = cotangents
    S = cfg["src_len"]
    n_src = 2 if cfg["dual"] else 1
    align_pad = _ceil128(n_src * S)
    g_align = jnp.pad(
        jnp.asarray(g_align, jnp.float32),
        ((0, 0), (0, 0), (0, align_pad - n_src * S)),
    )
    io = (
        (lambda x: jnp.asarray(x, jnp.bfloat16))
        if cfg["io_dtype"] == "bfloat16"
        else (lambda x: jnp.asarray(x, jnp.float32))
    )
    tr = lambda x: io(jnp.transpose(x))
    w_lsWT = (
        tr(_ls_w_padded(cfg, weights))
        if _is_ls(cfg) else jnp.zeros((8, 8), jnp.float32)
    )
    operands = _common_operands(cfg, weights, conds, feeds, seed) + (
        tr(weights["w_attg"]),
        tr(weights["w_qp"]), tr(weights["w_ta"]),
        tr(weights["w_l1"]), tr(weights["w_l2"]),
        w_lsWT,
        jnp.asarray(g_feat, jnp.float32),
        g_align,
        carries,
        acts,
    )
    outs = _run_bwd(operands, cfg_key)
    g = dict(zip(_GRAD_NAMES, outs))
    stacks = outs[-1]

    # ---- batched weight gradients from the exported per-step stacks ----
    # Inputs reconstruct from the carries residual (state at step t-1/t);
    # contraction over all N·B step-examples rides the MXU in one op per
    # weight instead of N underutilized B-deep passes inside the kernel.
    clayout, _ = _carry_layout(cfg)
    slayout, _ = _stack_layout(cfg)
    dual = cfg["dual"]
    use_ta = cfg["use_ta"]

    def ccol(arr, name):
        off, w = clayout[name]
        return arr[..., off : off + w]

    def scol(name):
        off, w = slayout[name]
        return stacks[..., off : off + w]

    f32 = jnp.float32
    mm = (
        (lambda x: x.astype(jnp.bfloat16))
        if cfg["io_dtype"] == "bfloat16"
        else (lambda x: x.astype(f32))
    )
    # cast the f32 carries residual to the matmul dtype ONCE, before the
    # concat/slice assembly below: every consumer is an io_dtype matmul,
    # so assembling in f32 just doubled the HBM bandwidth of the
    # concatenated copies (rounding before vs after a concat/slice is
    # value-identical)
    carries = mm(carries)
    prev = jnp.concatenate(
        [jnp.zeros_like(carries[:1]), carries[:-1]], axis=0
    )

    def dT(x_nbi, g_nbo):
        n, b = x_nbi.shape[:2]
        return jax.lax.dot_general(
            mm(x_nbi.reshape(n * b, -1)), mm(g_nbo.reshape(n * b, -1)),
            (((0,), (0,)), ((), ())), preferred_element_type=f32,
        )

    def bsum(name):
        # bias grads come from the kernel's f32 d_brow accumulator (the
        # N-sum happened in-kernel); only the B-sum remains
        off, w = slayout[name]
        return jnp.sum(g["d_brow"][:, off : off + w], axis=0)

    spk = conds.get("spk")
    # x2 (the hoisted prenet's output) is the feeds residual itself
    att_parts = [jnp.transpose(mm(jnp.asarray(feeds)), (1, 0, 2))]
    if cfg["spk_dim"]:
        # mm-cast BEFORE the concat: a mixed-dtype concatenate would
        # silently promote the whole assembled att_in back to f32
        att_parts.append(
            jnp.broadcast_to(
                mm(jnp.asarray(spk))[None], (carries.shape[0],) + spk.shape
            )
        )
    att_parts += [ccol(prev, "ctx1")]
    if dual:
        att_parts.append(ccol(prev, "ctx2"))
    att_parts.append(ccol(prev, "h_att"))
    att_in = jnp.concatenate(att_parts, axis=-1)
    g_z_att = scol("g_z_att")

    h_att_t = ccol(carries, "h_att")
    din1 = jnp.concatenate(
        [h_att_t, ccol(carries, "ctx1")]
        + ([ccol(carries, "ctx2")] if dual else [])
        + [ccol(prev, "h1")],
        axis=-1,
    )
    din2 = jnp.concatenate(
        [ccol(carries, "h1"), ccol(prev, "h2")], axis=-1
    )
    g_weights = {
        "w_attg": dT(att_in, g_z_att), "b_attg": bsum("g_z_att"),
        "w_qp": dT(h_att_t, scol("g_qp")), "vblk": jnp.transpose(g["d_vblk"]),
        "w_l1": dT(din1, scol("g_z1")), "b_l1": bsum("g_z1"),
        "w_l2": dT(din2, scol("g_z2")), "b_l2": bsum("g_z2"),
    }
    if use_ta:
        ta_in = jnp.concatenate([ccol(carries, "ctx1"), h_att_t], axis=-1)
        g_weights["w_ta"] = dT(ta_in, scol("g_u_pre"))
        g_weights["b_ta"] = bsum("g_u_pre")
    else:
        g_weights["w_ta"] = jnp.zeros_like(jnp.asarray(weights["w_ta"], f32))
        g_weights["b_ta"] = jnp.zeros_like(jnp.asarray(weights["b_ta"], f32))
    if _is_ls(cfg):
        # unpad the K_pad rows / a_tot lanes of the in-kernel accumulators;
        # autodiff outside the custom_vjp distributes these onto the real
        # conv / location-layer / attention-bias params
        g_weights["w_lsW"] = g["d_lsW"][: cfg["ls_kernel"]]
        g_weights["ls_bias"] = g["d_lsbias"][0, : cfg["att1_units"]]
    else:
        g_weights["w_lsW"] = jnp.zeros_like(jnp.asarray(weights["w_lsW"], f32))
        g_weights["ls_bias"] = jnp.zeros_like(jnp.asarray(weights["ls_bias"], f32))

    # d_mem from alignment × exported context-gradient stacks
    alpha1_s = aligns[..., :S]
    d_mem1 = jnp.einsum(
        "nbs,nbe->bse", mm(alpha1_s), mm(scol("g_ctx1")),
        preferred_element_type=f32,
    )
    g_conds = {
        "keys": g["d_keys"],
        "mem1": d_mem1,
        "score_bias": jnp.zeros_like(jnp.asarray(conds["score_bias"])),
    }
    if dual:
        alpha2_s = aligns[..., S : 2 * S]
        g_conds["mem2"] = jnp.einsum(
            "nbs,nbe->bse", mm(alpha2_s), mm(scol("g_ctx2")),
            preferred_element_type=f32,
        )
    elif conds.get("mem2") is not None:
        g_conds["mem2"] = jnp.zeros_like(conds["mem2"])
    if conds.get("spk") is not None:
        g_conds["spk"] = g["d_spk"][:, : cfg["spk_dim"]]
    # custom_vjp requires cotangent dtypes to match the primals (e.g.
    # bf16 memories under bfloat16 compute; accumulators are f32)
    g_weights = jax.tree.map(
        lambda gg, w: gg.astype(jnp.asarray(w).dtype), g_weights, dict(weights)
    )
    g_conds = {
        k: v.astype(jnp.asarray(conds[k]).dtype) for k, v in g_conds.items()
    }
    # feeds is the hoisted prenet's output — its cotangent flows back to
    # the prenet weights through the outside-kernel matmuls via autodiff
    g_feeds = jnp.transpose(scol("g_feed"), (1, 0, 2)).astype(
        jnp.asarray(feeds).dtype
    )
    # integer primals take a float0 cotangent (JAX convention; an int32
    # zero happens to be tolerated today but is fragile across upgrades)
    g_seed = np.zeros(jnp.shape(seed), jax.dtypes.float0)
    return (g_weights, g_conds, g_feeds, g_seed)


_teacher_decode.defvjp(_teacher_decode_fwd, _teacher_decode_bwd)


def teacher_decode(
    *,
    weights: Dict[str, jnp.ndarray],
    keys: jnp.ndarray,            # (B, S, A1[+A2]) concatenated attention keys
    mem1: jnp.ndarray,
    mem2,                         # (B, S, E2) or None
    score_bias: jnp.ndarray,      # (B, S) f32, 0 valid / NEG_INF padded
    spk,                          # (B, SPK) or None
    feeds: jnp.ndarray,           # (B, N, F) teacher feeds
    seed,                         # () int32
    hp_like: Dict,                # dims/flags: see cfg construction
    interpret: bool = False,
    slice_batch=None,             # test/profiling override of the block size
):
    """Differentiable fused teacher-forced decode.

    Returns (features (B, N, DU) f32, alignments (B, N, n_src·S) f32).

    The PRENET IS HOISTED out of the sequential kernel: in teacher
    forcing its inputs (the ground-truth feed frames) are known for all
    N steps ahead of time, so both layers run here as one batched
    (B·N)-deep MXU matmul pair (with jax-PRNG inference dropout) instead
    of 2 of the ~9 latency-bound sequential matmuls per decoder step —
    and the kernel's exported g_feed cotangent lets plain autodiff
    produce the prenet weight gradients through these same matmuls.

    Batches beyond the single-launch VMEM budget run as SEQUENTIAL batch
    blocks (mirroring fused_decode's inference-side slicing, VERDICT r3
    missing #3): the slicing happens OUTSIDE the custom_vjp, so under
    ``jax.grad`` the weight gradients of the blocks sum automatically
    (gradient accumulation) and the per-utterance conditioning gradients
    (d_keys, d_mem, d_spk) concatenate — no bespoke accumulation code. A
    ragged tail block is zero-padded to 8 lanes; padded lanes receive zero
    cotangents (their outputs are sliced off before the loss), and every
    adjoint in the backward kernel is linear in the incoming cotangent, so
    they contribute exactly zero gradient.
    """
    io_dtype = jnp.bfloat16 if hp_like["io_dtype"] == "bfloat16" else jnp.float32
    drop = float(hp_like["prenet_drop_rate"])

    def dense_relu(x, w, b):
        pre = jnp.dot(
            x.astype(io_dtype), jnp.asarray(w, io_dtype),
            preferred_element_type=jnp.float32,
        ) + jnp.asarray(b, jnp.float32)
        # jax.nn.relu, NOT jnp.maximum: the zero go-frame with zero-init
        # biases lands EXACTLY on the ReLU tie, where maximum's autodiff
        # splits the cotangent 1/2 but modules.py PreNet (nn.relu) and the
        # XLA scan path give 0 — bias grads would silently diverge.
        return jax.nn.relu(pre)

    x1 = dense_relu(feeds, weights["w_p1"], weights["b_p1"])
    if drop > 0.0:
        kp = 1.0 - drop
        k1, k2 = jax.random.split(
            jax.random.fold_in(jax.random.PRNGKey(jnp.asarray(seed, jnp.int32)), 7)
        )
        x1 = jnp.where(jax.random.bernoulli(k1, kp, x1.shape), x1 / kp, 0.0)
    x2 = dense_relu(x1, weights["w_p2"], weights["b_p2"])
    if drop > 0.0:
        x2 = jnp.where(jax.random.bernoulli(k2, kp, x2.shape), x2 / kp, 0.0)
    inner_weights = {
        k: v for k, v in weights.items()
        if k not in ("w_p1", "b_p1", "w_p2", "b_p2")
    }
    return _decode_core(
        weights=inner_weights, keys=keys, mem1=mem1, mem2=mem2,
        score_bias=score_bias, spk=spk, feeds=x2, seed=seed,
        hp_like=hp_like, interpret=interpret, slice_batch=slice_batch,
    )


def _decode_core(
    *,
    weights: Dict[str, jnp.ndarray],
    keys: jnp.ndarray,
    mem1: jnp.ndarray,
    mem2,
    score_bias: jnp.ndarray,
    spk,
    feeds: jnp.ndarray,           # (B, N, P2) HOISTED-PRENET output
    seed,
    hp_like: Dict,
    interpret: bool = False,
    slice_batch=None,
):
    """Batch-block dispatch + the custom_vjp call (post-prenet)."""
    B, N, F = feeds.shape
    S = keys.shape[1]
    fits_kw = dict(
        num_steps=N, src_len=S, feed_dim=F,
        dec_units=hp_like["dec_units"],
        mem_dims=int(mem1.shape[-1])
        + (int(mem2.shape[-1]) if mem2 is not None else 0),
        key_dim=int(keys.shape[-1]),
        io_bytes=2 if hp_like["io_dtype"] == "bfloat16" else 4,
        dual=hp_like["dual"],
        ls_taps=(
            int(hp_like.get("ls_kernel", 31))
            if hp_like.get("src1_kind") == "location_sensitive" else 0
        ),
        att1_units=int(hp_like["att1_units"]),
    )
    b_max = slice_batch
    if b_max is None and not (interpret or FORCE_INTERPRET):
        if not fused_teacher_fits(batch=B, **fits_kw):
            b_max = fused_teacher_max_batch(**fits_kw)
            assert b_max, "even an 8-lane teacher block exceeds VMEM"
    if b_max and B > b_max:
        pad8 = lambda n: ((n + 7) // 8) * 8
        feats, aligns = [], []
        for i, start in enumerate(range(0, B, b_max)):
            end = min(start + b_max, B)
            bp = pad8(end - start)
            blk = lambda x: (
                None if x is None
                else jnp.pad(
                    x[start:end],
                    ((0, bp - (end - start)),) + ((0, 0),) * (x.ndim - 1),
                )
            )
            f, a = _decode_core(
                weights=weights, keys=blk(keys), mem1=blk(mem1),
                mem2=blk(mem2), score_bias=blk(score_bias), spk=blk(spk),
                feeds=blk(feeds),
                # distinct per-block zoneout-mask streams from the one
                # seed (prenet dropout was drawn pre-slicing, whole-batch)
                seed=jnp.asarray(seed, jnp.int32) + jnp.int32(i * 1000003),
                hp_like=hp_like, interpret=interpret,
            )
            feats.append(f[: end - start])
            aligns.append(a[: end - start])
        return jnp.concatenate(feats, 0), jnp.concatenate(aligns, 0)
    cfg = dict(
        batch=B, src_len=S, num_steps=N, feed_dim=F,
        dual=hp_like["dual"], use_ta=hp_like["use_ta"],
        spk_dim=0 if spk is None else int(spk.shape[-1]),
        prenet_units=tuple(hp_like["prenet_units"]),
        att_units=hp_like["att_units"],
        att1_units=hp_like["att1_units"], att2_units=hp_like["att2_units"],
        dec_units=hp_like["dec_units"],
        mem1_dim=int(mem1.shape[-1]),
        mem2_dim=int(mem2.shape[-1]) if mem2 is not None else 8,
        zoneout_cell=hp_like["zoneout_cell"],
        zoneout_output=hp_like["zoneout_output"],
        io_dtype=hp_like["io_dtype"],
        src1_kind=hp_like.get("src1_kind", "forward"),
        ls_cumulative=bool(hp_like.get("ls_cumulative", True)),
        ls_kernel=int(hp_like.get("ls_kernel", 31)),
        eval_zoneout=bool(hp_like.get("eval_zoneout", False)),
        interpret=bool(interpret or FORCE_INTERPRET),
    )
    if _is_ls(cfg):
        assert not cfg["use_ta"], "transition agent is a forward-attention knob"
        assert "w_lsW" in weights and "ls_bias" in weights
    else:
        # the weights pytree must be structurally identical across kinds
        # (custom_vjp requires matching grad structure)
        weights = dict(weights)
        weights.setdefault("w_lsW", jnp.zeros((8, 8), jnp.float32))
        weights.setdefault("ls_bias", jnp.zeros((1,), jnp.float32))
    cfg_key = tuple(sorted(cfg.items()))
    conds = {"keys": keys, "mem1": mem1, "score_bias": score_bias}
    if mem2 is not None:
        conds["mem2"] = mem2
    if spk is not None:
        conds["spk"] = spk
    features, aligns = _teacher_decode(cfg_key, weights, conds, feeds, seed)
    features = jnp.transpose(features, (1, 0, 2))     # (B, N, DU)
    aligns = jnp.transpose(aligns, (1, 0, 2))         # (B, N, n_src·S)
    return features, aligns
