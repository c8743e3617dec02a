"""Measured VPU/MXU budget probe for the fused ViT block kernel.

The dense fused block runs ~10.9k img/s at DeiT-S bs128 on v5e — ~30% MFU.
The MXU work per layer-image is ~2.3us; where do the other ~5us go? This
probe times ablated kernel variants (identical BlockSpecs/grid, one body
change each) so the deltas attribute the budget:

  full            exact production kernel body
  nogelu          gelu -> identity          (cost of exp/div on (L,hidden))
  silu_gelu       x*sigmoid(1.702x)         (cheap-GELU candidate)
  nosoftmax       p = s*1e-4                (cost of exp/max/sum/div on scores)
  unnorm_softmax  defer /sum to after p@v   (the deferred-normalization opt)
  noln            LN -> x*scale             (cost of mean/var/rsqrt passes)
  ln_onepass      var = E[x^2]-mu^2         (one-pass LN candidate)
  nomask          skip q*msk / v*msk        (cost of the lane-mask multiplies)
  stackq          one (2L,L) score matmul   (stacked-q pair-attention probe)
  f32attn         f32 q/k/v matmul operands (cost we AVOID by bf16 MXU)

Run on the real TPU:  nohup timeout 1500 python tools/probe_block_budget.py &
"""

from __future__ import annotations

import functools
import json
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

sys.path.insert(0, "/root/repo")

from laudnet_tpu.ops.pallas.vit_block import (  # noqa: E402
    NEG, _gelu_exact, _ln, _pick_bb, _spec_for,
    _gelu_tanh as _shipped_gelu_tanh,
    _ln_onepass as _shipped_ln_onepass,
)

BATCH, L, D, H = 128, 197, 384, 6
HIDDEN = 4 * D
CHAIN, REPEATS = 30, 3


def _ln_scale_only(x, scale, bias, eps):
    return x.astype(jnp.float32) * scale.astype(jnp.float32)


def _silu_gelu(x):
    return x * jax.nn.sigmoid(1.702 * x)


# the fast-math candidates that SHIPPED must be measured as the served
# kernel bodies, not private copies — import them so a change to the
# shipped forms (tanh constants, the var clamp) re-measures truthfully
_ln_onepass = _shipped_ln_onepass
_tanh_gelu = _shipped_gelu_tanh


_BNUMS = (((2,), (2,)), ((0,), (0,)))
_PV_NUMS = (((2,), (1,)), ((0,), (0,)))


def _attention(qkv, neg, d, dh, n_pairs, sm_scale, cdt, mode):
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, 1, 2 * dh), 2)
    m_lo = (lane < dh).astype(cdt)
    m_hi = (lane >= dh).astype(cdt)
    if mode == "premask":
        # q arrives PRE-MASKED from zeroed weight columns (two 128-lane
        # copies per pair); v stays unmasked — the merge selects each
        # head's valid lanes instead of masking v before the matmul
        outs = []
        for hp in range(n_pairs):
            halves = []
            k2 = qkv[:, :, 2 * d + 2 * dh * hp:2 * d + 2 * dh * (hp + 1)]
            v2 = qkv[:, :, 3 * d + 2 * dh * hp:3 * d + 2 * dh * (hp + 1)]
            for half in (0, 1):
                off = 4 * dh * hp + 2 * dh * half
                qh = qkv[:, :, off:off + 2 * dh]
                s = jax.lax.dot_general(
                    qh, k2, dimension_numbers=_BNUMS,
                    preferred_element_type=jnp.float32,
                ) * sm_scale + neg
                p = jnp.exp(s - jax.lax.stop_gradient(
                    s.max(axis=-1, keepdims=True)))
                o = jax.lax.dot_general(
                    p.astype(cdt), v2, dimension_numbers=_PV_NUMS,
                    preferred_element_type=jnp.float32,
                )
                halves.append(o / p.sum(axis=-1, keepdims=True))
            outs.append(jnp.where(lane < dh, halves[0],
                                  halves[1]).astype(cdt))
        return jnp.concatenate(outs, axis=-1)
    outs = []
    for hp in range(n_pairs):
        off = 2 * dh * hp
        q2 = qkv[:, :, off:off + 2 * dh]
        k2 = qkv[:, :, d + off:d + off + 2 * dh]
        v2 = qkv[:, :, 2 * d + off:2 * d + off + 2 * dh]
        if mode in ("stackq", "stackq_unnorm"):
            # one (2L, 128) x (128, L) score matmul for the pair; softmax
            # over keys still per-row; pv stays two masked matmuls with
            # sublane slices of p. 'stackq_unnorm' also defers the softmax
            # normalization to after p@v (divide the (L,128) output rather
            # than the (2L,L) probabilities).
            q_st = jnp.concatenate([q2 * m_lo, q2 * m_hi], axis=1)
            s = jax.lax.dot_general(
                q_st, k2, dimension_numbers=_BNUMS,
                preferred_element_type=jnp.float32,
            ) * sm_scale + neg
            if mode == "stackq_unnorm":
                p = jnp.exp(s - jax.lax.stop_gradient(
                    s.max(axis=-1, keepdims=True)))
                rows = p.sum(axis=-1, keepdims=True)
            else:
                p = jax.nn.softmax(s, axis=-1)
                rows = None
            ll = q2.shape[1]
            pair = None
            for half, msk in ((0, m_lo), (1, m_hi)):
                ph = p[:, half * ll:(half + 1) * ll, :]
                o = jax.lax.dot_general(
                    ph.astype(cdt), v2 * msk, dimension_numbers=_PV_NUMS,
                    preferred_element_type=jnp.float32,
                )
                if rows is not None:
                    o = o / rows[:, half * ll:(half + 1) * ll, :]
                pair = o if pair is None else pair + o
            outs.append(pair.astype(cdt))
            continue
        if mode == "vselect":
            # q masked as shipped; v UNMASKED — the merge lane-selects
            # each head's valid half instead of pre-masking v (bit-exact:
            # the selected lanes carry the identical f32 contraction)
            halves = []
            for msk in (m_lo, m_hi):
                s = jax.lax.dot_general(
                    q2 * msk, k2, dimension_numbers=_BNUMS,
                    preferred_element_type=jnp.float32,
                ) * sm_scale + neg
                p = jnp.exp(s - jax.lax.stop_gradient(
                    s.max(axis=-1, keepdims=True)))
                o = jax.lax.dot_general(
                    p.astype(cdt), v2, dimension_numbers=_PV_NUMS,
                    preferred_element_type=jnp.float32,
                )
                halves.append(o / p.sum(axis=-1, keepdims=True))
            outs.append(jnp.where(lane < dh, halves[0],
                                  halves[1]).astype(cdt))
            continue
        pair = None
        nomask = mode in ("nomask", "unnorm_nomask")
        for msk in (m_lo, m_hi):
            qh = q2 if nomask else q2 * msk
            if mode == "f32attn":
                qh = qh.astype(jnp.float32)
                kh = k2.astype(jnp.float32)
            else:
                kh = k2
            s = jax.lax.dot_general(
                qh, kh, dimension_numbers=_BNUMS,
                preferred_element_type=jnp.float32,
            ) * sm_scale + neg
            if mode in ("nosoftmax", "noexp"):
                p = s * 1e-4
            elif mode == "unnorm_nosub":
                p = jnp.exp(s)  # skip the row-max reduce + subtract
            elif mode in ("unnorm", "unnorm_nomask"):
                p = jnp.exp(s - jax.lax.stop_gradient(
                    s.max(axis=-1, keepdims=True)))
            else:
                p = jax.nn.softmax(s, axis=-1)
            vh = v2 if nomask else v2 * msk
            if mode == "f32attn":
                vh = vh.astype(jnp.float32)
            o = jax.lax.dot_general(
                p.astype(vh.dtype), vh, dimension_numbers=_PV_NUMS,
                preferred_element_type=jnp.float32,
            )
            if mode in ("unnorm", "unnorm_nomask", "unnorm_nosub"):
                o = o / p.sum(axis=-1, keepdims=True)
            pair = o if pair is None else pair + o
        outs.append(pair.astype(cdt))
    return jnp.concatenate(outs, axis=-1)


def build_block(params, mode):
    d, hidden = D, HIDDEN
    dh = d // H
    da = d
    n_pairs = H // 2
    sm_scale = dh**-0.5
    combo = mode.startswith("combo")
    fast = mode.startswith("fast")  # combo WITHOUT stackq: plain per-head
    post = mode.startswith("post")  # ablations ON TOP of the shipped
    #                                 fast-math body (what remains?)
    ln = (_ln_scale_only if mode == "post_noln" else
          _ln_onepass if (combo or fast or post) else
          {"noln": _ln_scale_only, "ln_onepass": _ln_onepass}.get(mode, _ln))
    gelu = ((lambda u: u) if mode == "post_nogelu" else
            _tanh_gelu if post else
            {"nogelu": (lambda u: u), "silu_gelu": _silu_gelu,
             "tanh_gelu": _tanh_gelu,
             "combo_exact": _gelu_exact, "combo_tanh": _tanh_gelu,
             "combo_silu": _silu_gelu,
             "fast_exact": _gelu_exact, "fast_tanh": _tanh_gelu,
             "fast_silu": _silu_gelu}.get(mode, _gelu_exact))
    attn_mode = ("stackq_unnorm" if combo else
                 "unnorm" if fast else
                 {"post_noexp": "noexp", "post_nosub": "unnorm_nosub",
                  "post_nomask": "unnorm_nomask",
                  "post_premask": "premask",
                  "post_vselect": "vselect"}.get(mode, "unnorm")
                 if post else
                 mode if mode in ("nosoftmax", "unnorm", "nomask", "stackq",
                                  "stackq_unnorm", "f32attn") else "full")
    bf16res = mode == "post_bf16res"
    norowmask = mode == "post_norowmask"

    def fn(x):
        b, l, _ = x.shape
        it = x.dtype.itemsize

        def vmem_bytes(bb):
            tok = bb * l
            return (4 * tok * d * it + tok * 3 * da * it
                    + 2 * bb * l * l * 4 + 2 * tok * d * 4
                    + tok * (da + d) * it + tok * (hidden + d) * 4
                    + (d * 3 * da + da * d + 2 * d * hidden
                       + 4 * d + 4 * da + hidden) * it)

        bb, vlim = _pick_bb(b, 1, vmem_bytes, None)
        grid = (b // bb,)
        key_mask = jnp.ones((b, 1, l), x.dtype)
        row_mask = jnp.ones((b, l, 1), x.dtype)
        w = params
        wqkv_a, bqkv_a = w["wqkv"], w["bqkv"]
        if attn_mode == "premask":
            # fold the q lane masks into ZEROED WEIGHT COLUMNS: per pair,
            # two 128-lane q copies (lo-masked, hi-masked) — the mask
            # multiply becomes free MXU zeros; bias masked identically
            wq, wk, wv = (wqkv_a[:, :da], wqkv_a[:, da:2 * da],
                          wqkv_a[:, 2 * da:])
            bq, bk, bv = (bqkv_a[:, :da], bqkv_a[:, da:2 * da],
                          bqkv_a[:, 2 * da:])
            lane = np.arange(2 * dh)
            mlo = jnp.asarray(lane < dh, wqkv_a.dtype)
            mhi = jnp.asarray(lane >= dh, wqkv_a.dtype)
            qc, bc = [], []
            for hp in range(n_pairs):
                c = wq[:, 2 * dh * hp:2 * dh * (hp + 1)]
                bcol = bq[:, 2 * dh * hp:2 * dh * (hp + 1)]
                qc += [c * mlo, c * mhi]
                bc += [bcol * mlo, bcol * mhi]
            wqkv_a = jnp.concatenate(qc + [wk, wv], axis=1)
            bqkv_a = jnp.concatenate(bc + [bk, bv], axis=1)
        args = [x, key_mask, row_mask,
                w["ln1s"], w["ln1b"], wqkv_a, bqkv_a, w["wproj"],
                w["bproj"], w["ln2s"], w["ln2b"], w["w1"], w["b1"],
                w["w2"], w["b2"]]
        in_specs = [_spec_for(a, k < 3, bb) for k, a in enumerate(args)]
        mm = functools.partial(
            jax.lax.dot_general,
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)

        def kernel(x_ref, kmask_ref, rmask_ref, ln1s, ln1b, wqkv, bqkv,
                   wproj, bproj, ln2s, ln2b, w1, b1, w2, b2, out_ref):
            xin = x_ref[:]
            cdt = xin.dtype
            neg = (1.0 - kmask_ref[:].astype(jnp.float32)) * NEG
            rmask = rmask_ref[:].astype(jnp.float32)
            h1 = ln(xin, ln1s[0], ln1b[0], 1e-6).astype(cdt)
            qkv = (mm(h1.reshape(bb * l, d), wqkv[:])
                   + bqkv[:].astype(jnp.float32)).astype(cdt)
            qkv = qkv.reshape(bb, l, -1)  # 3*da (4*da when premasked)
            attn = _attention(qkv, neg, da, dh, n_pairs, sm_scale, cdt,
                              attn_mode)
            proj = (mm(attn.reshape(bb * l, da), wproj[:])
                    + bproj[:].astype(jnp.float32)).reshape(bb, l, d)
            if bf16res:
                x2 = (xin + (proj * rmask).astype(cdt)).astype(jnp.float32)
            else:
                x2 = xin.astype(jnp.float32) + (proj * rmask
                                                if not norowmask else proj)
            h2 = ln(x2.astype(cdt), ln2s[0], ln2b[0], 1e-6).astype(cdt)
            u = mm(h2.reshape(bb * l, d), w1[:]) + b1[:].astype(jnp.float32)
            u = gelu(u).astype(cdt)
            y = (mm(u, w2[:]) + b2[:].astype(jnp.float32)).reshape(bb, l, d)
            out_ref[:] = (x2 + (y * rmask if not norowmask else y)
                          ).astype(out_ref.dtype)

        return pl.pallas_call(
            kernel, grid=grid, in_specs=in_specs,
            out_specs=pl.BlockSpec((bb, l, d), lambda i: (i, 0, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((b, l, d), x.dtype),
            compiler_params=(None if vlim is None else
                             pltpu.CompilerParams(vmem_limit_bytes=vlim)),
        )(*args)

    return fn


def chain_time(step_fn, x):
    @jax.jit
    def chained(x):
        def body(i, carry):
            x, acc = carry
            y = step_fn(x)
            s = y.reshape(-1)[0].astype(jnp.float32)
            x = x + (s * 1e-20).astype(x.dtype)
            return (x, acc + s)

        _, acc = jax.lax.fori_loop(0, CHAIN, body, (x, jnp.float32(0.0)))
        return acc

    float(chained(x))
    best = float("inf")
    for _ in range(REPEATS):
        t0 = time.perf_counter()
        float(chained(x))
        best = min(best, (time.perf_counter() - t0) / CHAIN)
    return best


def main():
    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    rng = np.random.default_rng(0)
    d, hidden = D, HIDDEN
    params = {
        "ln1s": jnp.ones((1, d), jnp.bfloat16),
        "ln1b": jnp.zeros((1, d), jnp.bfloat16),
        "wqkv": jnp.asarray(rng.standard_normal((d, 3 * d)) * 0.05,
                            jnp.bfloat16),
        "bqkv": jnp.zeros((1, 3 * d), jnp.bfloat16),
        "wproj": jnp.asarray(rng.standard_normal((d, d)) * 0.05,
                             jnp.bfloat16),
        "bproj": jnp.zeros((1, d), jnp.bfloat16),
        "ln2s": jnp.ones((1, d), jnp.bfloat16),
        "ln2b": jnp.zeros((1, d), jnp.bfloat16),
        "w1": jnp.asarray(rng.standard_normal((d, hidden)) * 0.05,
                          jnp.bfloat16),
        "b1": jnp.zeros((1, hidden), jnp.bfloat16),
        "w2": jnp.asarray(rng.standard_normal((hidden, d)) * 0.05,
                          jnp.bfloat16),
        "b2": jnp.zeros((1, d), jnp.bfloat16),
    }
    x = jnp.asarray(rng.standard_normal((BATCH, L, D)) * 0.5, jnp.bfloat16)

    overhead = chain_time(lambda x: x, x)
    import sys
    if "--fast" in sys.argv:
        modes = ["full", "fast_exact", "fast_tanh", "fast_silu"]
    elif "--post" in sys.argv:
        # what remains AFTER the shipped fast-math body: ablate each
        # surviving VPU stage on top of fast_tanh (deltas vs fast_tanh)
        modes = ["full", "fast_tanh", "post_vselect", "post_premask",
                 "post_noexp", "post_nosub", "post_nomask", "post_noln",
                 "post_nogelu", "post_norowmask", "post_bf16res"]
    elif "--combos" in sys.argv:
        modes = ["full", "tanh_gelu", "stackq_unnorm", "combo_exact",
                 "combo_tanh", "combo_silu"]
    else:
        modes = ["full", "nogelu", "silu_gelu", "nosoftmax", "unnorm",
                 "noln", "ln_onepass", "nomask", "stackq", "f32attn"]
    results = {}
    base = None
    for mode in modes:
        fn = build_block(params, mode)
        # numeric check vs full (where semantics should agree)
        t = max(chain_time(fn, x) - overhead, 1e-9)
        us_per_img = t / BATCH * 1e6
        results[mode] = round(us_per_img, 3)
        if mode == "full":
            base = us_per_img
            ref_out = fn(x)
        elif mode in ("unnorm", "ln_onepass", "stackq", "stackq_unnorm",
                      "tanh_gelu", "combo_exact", "combo_tanh",
                      "combo_silu", "fast_exact", "fast_tanh", "fast_silu",
                      "post_premask", "post_vselect"):
            err = float(jnp.abs(fn(x).astype(jnp.float32)
                                - ref_out.astype(jnp.float32)).max())
            results[mode + "_maxerr"] = round(err, 6)
        print(f"{mode:>12}: {us_per_img:8.3f} us/img/layer "
              f"(delta {base - us_per_img:+.3f})", flush=True)
    print(json.dumps(results))


if __name__ == "__main__":
    main()
