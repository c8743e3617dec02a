"""Latency-aware serving engine + execution planner."""

import jax
import jax.numpy as jnp
import numpy as np

from laudnet_tpu.infer import ServingEngine
from laudnet_tpu.models.laud_vit import LAUDViT
from laudnet_tpu.sim.plan import (
    plan_resnet_serving,
    plan_vit_serving,
    rank_vit_paradigms,
)


def test_plan_vit_serving_picks_token_when_keeps_drop():
    keeps = (1.0,) * 3 + (0.7,) * 4 + (0.5,) * 5
    plan = plan_vit_serving(keeps)
    assert plan.mode == "token"
    assert plan.predicted_speedup > 1.2
    # capacities are monotone non-increasing
    caps = plan.token_capacity
    assert all(caps[i] >= caps[i + 1] for i in range(len(caps) - 1))
    assert plan.exact


def test_plan_vit_serving_monotone_clamp():
    # a noisy calibration that claims keep GROWS must be clamped down
    plan = plan_vit_serving((0.8, 0.5, 0.9, 0.6))
    assert plan.token_capacity is None or list(plan.token_capacity) == sorted(
        plan.token_capacity, reverse=True)


def test_plan_vit_dense_when_keeps_full():
    plan = plan_vit_serving((1.0,) * 12)
    # the no-selection decision on a token-GATED model is named by what
    # it serves: the masked graph (the gates stay) — so ServingEngine's
    # served == mode invariant holds on the no-win path too
    assert plan.mode == "dense-masked"
    assert plan.token_capacity is None
    # on the UNFUSED graph the r5 recalibration prices the policy heads
    # plus the materialized f32 (B,H,L,L) attention key mask
    # (sim/tpu.py key_mask term), so the predicted speedup vs the pure
    # ungated baseline is ~0.8
    assert 0.75 < plan.predicted_speedup <= 1.0
    assert plan.predicted_latency == plan.ranking["mask"]
    # the fused block engine builds the key mask in VMEM for ~free: the
    # same decision there stays marginally below 1.0
    fused = plan_vit_serving((1.0,) * 12, fused_block=True)
    assert fused.mode == "dense-masked"
    assert 0.95 < fused.predicted_speedup <= 1.0
    # an UNGATED model's no-selection decision is genuinely 'dense'
    ungated = plan_vit_serving((1.0,) * 12, dense_mode="dense")
    assert ungated.mode == "dense"


def test_rank_paradigms_orders_token_first():
    from laudnet_tpu.sim import TPU_PRESETS, TPUPredictor

    p = TPUPredictor(TPU_PRESETS["v5e"])
    r = rank_vit_paradigms(p, token_capacity=(0.5,) * 12)
    assert r["token"] < r["dense"]
    # masks without selection can't beat dense meaningfully
    assert r["head"] > 0.95 * r["dense"]


def test_rank_paradigms_prices_each_mode_at_its_served_engine():
    from laudnet_tpu.sim import TPU_PRESETS, TPUPredictor

    p = TPUPredictor(TPU_PRESETS["v5e"])
    r = rank_vit_paradigms(p, token_capacity=(0.5,) * 12, fused_block=True)
    # gating costs are strictly positive on every paradigm: no mode may
    # price exactly equal to dense under the block engine
    assert r["head"] > r["dense"]
    assert r["mask"] > r["dense"]
    # layer gating cannot serve the block engine (residual structure), so
    # it is priced on the attention-only fusion — well above block-dense
    assert r["layer"] > 1.05 * r["dense"]
    # selection still wins through the block engine
    assert r["token"] < r["dense"]


def test_plan_resnet_serving_channel():
    plan = plan_resnet_serving("resnet101", dyn_mode="channel")
    # on TPU the exact channel path is the dense-masked graph (~1.0x);
    # 'dense' (the ungated teacher) is rank-only — the speedup frame,
    # never a servable path for a gated model
    assert plan.mode == "dense-masked"
    assert "dense" in plan.ranking
    assert plan.exact
    p2 = plan_resnet_serving("resnet101", dyn_mode="channel",
                             act_rate=0.5, allow_static_export=True)
    assert p2.ranking["static-export"] < p2.ranking["dense"]
    assert p2.mode == "static-export" and not p2.exact


def test_serving_engine_vit_end_to_end():
    kw = dict(depth=3, dim=64, num_heads=4, mlp_ratio=2.0, patch_size=8,
              num_classes=10, head_skip=False, layer_skip=False)
    m = LAUDViT(**kw)
    x = jax.random.normal(jax.random.PRNGKey(0), (4, 32, 32, 3))
    v = m.init({"params": jax.random.PRNGKey(1)}, x, 1.0, training=False)
    # bias gates shut so the policy actually drops tokens
    params = jax.device_get(v["params"])
    for i in range(3):
        bias = np.zeros(2, np.float32)
        bias[1] = 1.5
        params[f"block_{i}"]["token_policy"]["bias"] = jnp.asarray(bias)
    v = {"params": params}

    ref = m.apply(v, x, 0.1, training=False)
    engine = ServingEngine(m, v, batch_size=128)
    # pre-calibration: dense-masked graph, exact
    np.testing.assert_allclose(np.asarray(engine(x)),
                               np.asarray(ref.logits), rtol=1e-5, atol=1e-5)

    plan = engine.calibrate([x], quantile=1.0, margin=1e-6)
    assert plan.kind == "vit"
    assert plan.mode == "token"  # keeps drop -> predictor picks selection
    assert plan.predicted_speedup > 1.0
    # the compiled winner still reproduces the masked-graph logits exactly
    np.testing.assert_allclose(np.asarray(engine(x)),
                               np.asarray(ref.logits), rtol=1e-4, atol=1e-4)


def test_serving_engine_resnet_plan():
    from laudnet_tpu.models import LAUDResNet

    m = LAUDResNet(layers=(1, 1, 1, 1), num_classes=10, input_size=64,
                   dyn_mode=("channel",) * 4)
    x = jax.random.normal(jax.random.PRNGKey(0), (2, 64, 64, 3))
    v = m.init({"params": jax.random.PRNGKey(1)}, x, 1.0, training=False)
    engine = ServingEngine(m, v)
    ref = m.apply(v, x, 0.1, training=False).logits
    np.testing.assert_allclose(np.asarray(engine(x)), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)
    plan = engine.calibrate([x])
    assert plan.kind == "resnet"
    assert plan.exact
    # tiny (1,1,1,1) geometry has no analytic model: the plan must say so
    # (empty ranking) rather than price the wrong network
    assert plan.ranking == {}
    assert plan.served == "dense-masked"


def test_plan_vit_int8_opt_in():
    """int8 variants are always RANKED when the block engine prices, but
    CHOSEN only when allow_int8 opts in AND int8 actually predicts
    faster. Since the r5 fast-math bf16 calibration that is geometry-
    dependent — MEASURED on v5e: at DeiT-S the fast bf16 engine beats
    int8 (20.6k vs 14.9k img/s snapped; int8 is insensitive to
    fast_math), at DeiT-B int8 still wins (4894 vs 4509 dense). The
    plan must decline int8 at S and choose it at B; dense-int8 carries
    no token_capacity."""
    from laudnet_tpu.sim.plan import plan_vit_serving

    keeps = (1.0,) * 3 + (0.7,) * 4 + (0.5,) * 5
    base = plan_vit_serving(keeps, fused_block=True)
    assert {"dense-int8", "token-int8"} <= base.ranking.keys()
    assert base.exact and not base.mode.endswith("-int8")

    # DeiT-S: allow_int8 opts in but bf16-fast wins -> stays exact token
    q = plan_vit_serving(keeps, fused_block=True, allow_int8=True)
    assert q.mode == "token" and q.exact
    assert q.ranking["token"] < q.ranking["token-int8"]

    # DeiT-B: int8 wins and is chosen (inexact)
    geo_b = dict(dim=768, num_heads=12)
    qb = plan_vit_serving(keeps, fused_block=True, allow_int8=True,
                          **geo_b)
    assert qb.mode == "token-int8" and not qb.exact
    qd = plan_vit_serving((1.0,) * 12, fused_block=True, allow_int8=True,
                          **geo_b)
    assert qd.mode == "dense-int8" and qd.token_capacity is None

    # snapped-int8 needs BOTH opt-ins (B geometry, where int8 wins)
    snap = plan_vit_serving(keeps, fused_block=True, allow_int8=True,
                            snap_capacities=True, **geo_b)
    assert snap.mode == "token-snapped-int8"
    # ...and at S the same opt-ins still serve exact snapped bf16
    snap_s = plan_vit_serving(keeps, fused_block=True, allow_int8=True,
                              snap_capacities=True)
    assert snap_s.mode == "token-snapped" and snap_s.exact
    # without the block engine there is nothing to quantize
    attn = plan_vit_serving(keeps, fused_attention=True, allow_int8=True)
    assert "dense-int8" not in attn.ranking and attn.exact


def test_serving_engine_allow_int8_serves_int8(monkeypatch):
    """calibrate(allow_int8=True) on a geometry where int8 actually wins
    (DeiT-B width — r5 measured: int8 beats bf16-fast at dim 768 but
    LOSES at DeiT-S, where the fast-math bf16 engine is quicker) chooses
    and compiles an int8 mode (plan.exact False, served==mode). The
    backend gate is monkeypatched open; the compiled pallas closure is
    never executed on CPU."""
    import laudnet_tpu.infer.engine as engine_mod

    kw = dict(depth=2, dim=768, num_heads=12, mlp_ratio=4.0, patch_size=16,
              num_classes=10, head_skip=False, layer_skip=False)
    m = LAUDViT(**kw)
    x = jax.random.normal(jax.random.PRNGKey(0), (2, 224, 224, 3))
    v = jax.jit(lambda: m.init({"params": jax.random.PRNGKey(1)}, x, 1.0,
                               training=False))()
    engine = ServingEngine(m, v)
    monkeypatch.setattr(engine_mod.jax, "default_backend", lambda: "tpu")
    plan = engine.calibrate([x], allow_int8=True)
    assert plan.mode.endswith("-int8") and not plan.exact
    assert plan.served == plan.mode
    assert {"dense-int8", "token-int8"} <= plan.ranking.keys()
    # without the opt-in the same engine stays exact
    plan2 = engine.calibrate([x])
    assert plan2.exact and not plan2.mode.endswith("-int8")
    # at DeiT-S width the same opt-in correctly DECLINES int8: the
    # measured fast-math bf16 engine out-runs it there
    ms = LAUDViT(depth=2, dim=384, num_heads=6, mlp_ratio=4.0,
                 patch_size=16, num_classes=10, head_skip=False,
                 layer_skip=False)
    vs = jax.jit(lambda: ms.init({"params": jax.random.PRNGKey(1)}, x, 1.0,
                                 training=False))()
    plan_s = ServingEngine(ms, vs).calibrate([x], allow_int8=True)
    assert plan_s.exact and not plan_s.mode.endswith("-int8")


def test_plan_resnet_serving_mixed_stage_modes():
    """Per-stage dyn_mode (the reference's channel-channel-layer-layer
    configs) gets a real per-stage-priced plan, not the no-ranking
    fallback."""
    plan = plan_resnet_serving(
        "resnet101", dyn_mode=("channel", "channel", "layer", "layer"))
    assert plan.mode == "dense-masked" and plan.exact
    assert plan.ranking["dense-masked"] > plan.ranking["dense"]
    # masker heads cost < 10% of the network
    assert plan.predicted_speedup > 0.9
    # a uniform sequence degrades to the full per-paradigm ranking
    uni = plan_resnet_serving("resnet101", dyn_mode=("channel",) * 4)
    assert uni.ranking.keys() == plan_resnet_serving(
        "resnet101", dyn_mode="channel").ranking.keys()


def test_plan_resnet_dense_masked_int8():
    """dense-masked-int8 (W8A8 convs, masks fully dynamic) is always
    ranked; on v5e/R101/bs128 the r3-measured anchor is a mild WIN
    (9874 vs 9109 img/s — XLA s8 convs at ~1.08x bf16), so allow_int8
    chooses it and the engine compiles conv_impl='int8'. Without the
    opt-in the exact path still wins (quantization is inexact)."""
    base = plan_resnet_serving("resnet101")
    assert "dense-masked-int8" in base.ranking
    assert base.exact and not base.mode.endswith("-int8")
    # calibrated pricing: a mild predicted win over the exact path
    ratio = (base.ranking["dense-masked"]
             / base.ranking["dense-masked-int8"])
    assert 1.0 < ratio < 1.2, ratio

    q = plan_resnet_serving("resnet101", allow_int8=True)
    assert q.mode == "dense-masked-int8" and not q.exact

    from laudnet_tpu.models import LAUDResNet

    m = LAUDResNet(layers=(3, 4, 23, 3), num_classes=10, input_size=64,
                   dyn_mode=("channel",) * 4,
                   channel_masker=("MLP",) * 4,
                   channel_masker_layers=(1, 1, 1, 1))
    x = jax.random.normal(jax.random.PRNGKey(0), (1, 64, 64, 3))
    v = jax.jit(lambda: m.init({"params": jax.random.PRNGKey(1)}, x, 1.0,
                               training=False))()
    engine = ServingEngine(m, v)
    plan = engine.calibrate([x], allow_int8=True)
    assert plan.mode == "dense-masked-int8"
    assert plan.served == "dense-masked-int8" and not plan.exact
    assert engine(x).shape == (1, 10)


def test_plan_resnet_static_export_int8():
    """static-export-int8 is ranked whenever static-export is, but on
    v5e it is a measured LOSS (9465 vs 13100 img/s static-scale; XLA s8
    convs don't reach the nominal 2x and the quantize passes break the
    export's fusion chains), so even with BOTH opt-ins the plan keeps
    the fp export."""
    base = plan_resnet_serving("resnet101", allow_static_export=True)
    assert "static-export-int8" in base.ranking
    assert base.ranking["static-export-int8"] > base.ranking["static-export"]
    assert base.mode == "static-export" and not base.exact

    only_int8 = plan_resnet_serving("resnet101", allow_int8=True)
    assert "static-export-int8" not in only_int8.ranking

    both = plan_resnet_serving("resnet101", allow_static_export=True,
                               allow_int8=True)
    # fp export still predicted fastest; int8 is only taken where its
    # calibrated pricing wins (not on v5e)
    assert both.mode == "static-export"


def test_serving_engine_regnet_no_ranking_plan():
    """A LAUD-RegNet (no `.layers`, no analytic TPU geometry for its
    widths) serves dense-masked with the honest no-ranking plan instead
    of crashing or pricing a wrong network."""
    from laudnet_tpu.models.laud_regnet import LAUDRegNet, RegNetParams

    p = RegNetParams(depths=(1, 1), widths=(24, 56), group_widths=(8, 8),
                     bottleneck_multipliers=(1.0, 1.0), se_ratio=0.25)
    m = LAUDRegNet(params_cfg=p, num_classes=10,
                   dyn_mode=("channel", "channel"),
                   spatial_mask_channel_group=(1, 1),
                   mask_spatial_granularity=(1, 1),
                   channel_dyn_granularity=(1, 1),
                   channel_masker=("MLP", "MLP"),
                   channel_masker_layers=(1, 1),
                   reduction_ratio=(16, 16))
    x = jax.random.normal(jax.random.PRNGKey(0), (1, 32, 32, 3))
    v = jax.jit(lambda: m.init({"params": jax.random.PRNGKey(1)}, x, 1.0,
                               training=False))()
    engine = ServingEngine(m, v)
    plan = engine.calibrate([x])
    assert plan.served == "dense-masked" and plan.ranking == {}
    assert engine(x).shape == (1, 10)


def test_serving_engine_mixed_dyn_mode_gets_ranked_plan():
    from laudnet_tpu.models import LAUDResNet

    m = LAUDResNet(layers=(3, 4, 23, 3), num_classes=10, input_size=64,
                   dyn_mode=("channel", "channel", "layer", "layer"))
    x = jax.random.normal(jax.random.PRNGKey(0), (1, 64, 64, 3))
    v = jax.jit(lambda: m.init({"params": jax.random.PRNGKey(1)}, x, 1.0,
                               training=False))()
    engine = ServingEngine(m, v)
    plan = engine.calibrate([x])
    assert plan.served == "dense-masked"
    assert "dense-masked" in plan.ranking and "dense" in plan.ranking
    assert plan.exact


def test_serving_engine_resnet101_ranked_plan():
    """A real-geometry model gets a ranked plan priced at the MEASURED
    activation rate, and the engine reports the served path separately."""
    from laudnet_tpu.models import LAUDResNet

    m = LAUDResNet(layers=(3, 4, 23, 3), num_classes=10, input_size=64,
                   dyn_mode=("channel",) * 4)
    x = jax.random.normal(jax.random.PRNGKey(0), (1, 64, 64, 3))
    v = jax.jit(lambda: m.init({"params": jax.random.PRNGKey(1)}, x, 1.0,
                               training=False))()
    engine = ServingEngine(m, v)
    plan = engine.calibrate([x])
    assert "dense-masked" in plan.ranking
    # served == mode holds on the default no-win path too: the plan's
    # no-selection decision is NAMED dense-masked ('dense' is rank-only,
    # the ungated speedup frame)
    assert plan.served == plan.mode == "dense-masked"
    assert plan.exact


def test_serving_engine_served_eq_mode_and_fast_math_recorded():
    """The served == mode invariant holds for the ViT no-selection
    decision (a token-gated model whose keeps stay ~1.0), and
    plan.fast_math records whether the compiled path runs the fast-math
    kernel bodies (False here: on CPU the block engine does not engage,
    so the flax masked graph serves)."""
    kw = dict(depth=2, dim=64, num_heads=4, mlp_ratio=2.0, patch_size=8,
              num_classes=10, head_skip=False, layer_skip=False)
    m = LAUDViT(**kw)
    x = jax.random.normal(jax.random.PRNGKey(0), (4, 32, 32, 3))
    v = m.init({"params": jax.random.PRNGKey(1)}, x, 1.0, training=False)
    # default init: gates stay ~open -> keeps ~1.0 -> no-selection wins
    engine = ServingEngine(m, v, batch_size=128)
    plan = engine.calibrate([x], quantile=1.0, margin=0.5)
    assert plan.mode == "dense-masked"
    assert plan.served == plan.mode
    assert plan.exact
    assert plan.fast_math is False  # CPU: attention/flax path, not fused
    ref = m.apply(v, x, 0.1, training=False).logits
    np.testing.assert_allclose(np.asarray(engine(x)), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)


def test_serving_engine_mesh_data_parallel():
    """With a 1-D mesh attached the engine serves data-parallel via
    shard_map: params replicated, batch sharded, outputs identical to the
    single-device engine (8-device CPU mesh from conftest)."""
    from laudnet_tpu.parallel.mesh import make_mesh

    kw = dict(depth=2, dim=64, num_heads=4, mlp_ratio=2.0, patch_size=8,
              num_classes=10, head_skip=False, layer_skip=False)
    m = LAUDViT(**kw)
    x = jax.random.normal(jax.random.PRNGKey(0), (8, 32, 32, 3))
    v = m.init({"params": jax.random.PRNGKey(1)}, x, 1.0, training=False)

    single = ServingEngine(m, v)
    mesh = make_mesh()
    assert mesh.size == 8
    sharded = ServingEngine(m, v, mesh=mesh)
    np.testing.assert_allclose(np.asarray(sharded(x)),
                               np.asarray(single(x)), rtol=1e-5, atol=1e-5)
    # the served array really is laid out over the mesh
    out = sharded(x)
    assert len(out.sharding.device_set) == 8

    # calibration + the compiled winner also run sharded
    plan = sharded.calibrate([x], quantile=1.0, margin=1e-6)
    assert plan.kind == "vit"
    np.testing.assert_allclose(np.asarray(sharded(x)),
                               np.asarray(single(x)), rtol=1e-4, atol=1e-4)


def test_sim_cli_plan_subcommand(capsys):
    from laudnet_tpu.sim.cli import main as sim_main

    plan = sim_main(["deit_small", "--hardware", "v5e",
                     "--plan", ",".join(["1.0"] * 3 + ["0.5"] * 9)])
    assert plan.mode == "token"
    out = capsys.readouterr().out
    assert "speedup" in out and "token" in out


def test_serving_engine_compiles_recommended_cnn_paths(monkeypatch):
    """When the plan recommends an in-process CNN path (layer-skip at
    batch 1, spatial fixed-capacity execution), the engine compiles and
    serves it: plan.served == plan.mode (VERDICT r2 item 10)."""
    from laudnet_tpu.models import LAUDResNet
    from laudnet_tpu.sim import plan as plan_mod

    def forced(mode):
        def fake_plan(name, **kw):
            return plan_mod.ExecutionPlan(
                kind="resnet", mode=mode, predicted_latency=1.0,
                dense_latency=2.0, predicted_speedup=2.0,
                ranking={"dense-masked": 2.0, mode: 1.0}, exact=True,
            )
        return fake_plan

    # --- layer-skip at batch 1 -------------------------------------------
    m = LAUDResNet(layers=(3, 4, 23, 3), num_classes=10, input_size=64,
                   dyn_mode=("layer",) * 4)
    x = jax.random.normal(jax.random.PRNGKey(0), (1, 64, 64, 3))
    v = jax.jit(lambda: m.init({"params": jax.random.PRNGKey(1)}, x, 1.0,
                               training=False))()
    engine = ServingEngine(m, v, batch_size=1)
    monkeypatch.setattr(plan_mod, "plan_resnet_serving",
                        forced("layerskip"))
    plan = engine.calibrate([x])
    assert plan.served == plan.mode == "layerskip"
    # the compiled layer-skip engine is bit-matched to the masked graph
    ref = m.apply(v, x, 0.1, training=False).logits
    np.testing.assert_allclose(np.asarray(engine(x)), np.asarray(ref),
                               rtol=2e-4, atol=2e-4)

    # --- spatial fixed-capacity execution --------------------------------
    ms = LAUDResNet(layers=(3, 4, 23, 3), num_classes=10, input_size=64,
                    dyn_mode=("spatial",) * 4,
                    mask_spatial_granularity=(4, 4, 2, 1))
    vs = jax.jit(lambda: ms.init({"params": jax.random.PRNGKey(2)}, x, 1.0,
                                 training=False))()
    engine2 = ServingEngine(ms, vs, batch_size=1)
    monkeypatch.setattr(plan_mod, "plan_resnet_serving",
                        forced("spatial-capacity"))
    plan2 = engine2.calibrate([x])
    assert plan2.served == plan2.mode == "spatial-capacity"
    assert plan2.token_capacity is not None
    assert all(0.0 < c <= 1.0 for c in plan2.token_capacity)
    out = np.asarray(engine2(x))
    assert np.isfinite(out).all() and out.shape == (1, 10)


def test_plan_vit_snapped_mode():
    """The plan always prices the lane-snapped budget variant; it is
    chosen only on opt-in (it keeps fewer tokens than calibrated), and
    the predictor's tile-quantization term must rank it faster than the
    nominal token schedule (measured: 15349 vs 13873 img/s on v5e)."""
    keeps = (1.0,) * 3 + (0.7,) * 4 + (0.5,) * 5

    plan = plan_vit_serving(keeps, fused_block=True)
    assert plan.mode == "token"
    assert "token-snapped" in plan.ranking
    assert plan.ranking["token-snapped"] < plan.ranking["token"]

    snapped = plan_vit_serving(keeps, fused_block=True,
                               snap_capacities=True)
    assert snapped.mode == "token-snapped"
    assert snapped.predicted_speedup > plan.predicted_speedup
    # snapped fractions decode to tile-grid token counts (137->128,
    # 98->96 at 197 tokens)
    ks = sorted({int(c * 197) for c in snapped.token_capacity if c < 1.0},
                reverse=True)
    assert ks == [128, 96]


def test_plan_mixed_stage_modes_respects_allow_int8():
    """The mixed per-stage branch ranks the paradigm-independent
    dense-masked-int8 path and honors allow_int8 (r4 fix: its early
    return silently dropped the opt-in, so a channel+layer model never
    got the int8 serving the uniform plan chooses)."""
    modes = ("channel", "channel", "layer", "layer")
    base = plan_resnet_serving("resnet101", dyn_mode=modes)
    assert "dense-masked-int8" in base.ranking
    assert base.mode == "dense-masked" and base.exact

    q = plan_resnet_serving("resnet101", dyn_mode=modes, allow_int8=True)
    assert q.mode == "dense-masked-int8" and not q.exact
    # same calibrated mild win as the uniform branch
    ratio = q.ranking["dense-masked"] / q.ranking["dense-masked-int8"]
    assert 1.0 < ratio < 1.2, ratio


def test_layerskip_mesh_gates_per_image(monkeypatch):
    """With a mesh attached, the layerskip serving path shard_maps over
    the data axis so each device gates on ITS OWN image (r4 fix: a bare
    jit applied image 0's skip decisions to the whole batch)."""
    from jax.sharding import Mesh

    from laudnet_tpu.infer.layerskip import build_layer_skip_resnet
    from laudnet_tpu.models import LAUDResNet
    from laudnet_tpu.sim import plan as plan_mod

    m = LAUDResNet(layers=(3, 4, 23, 3), num_classes=10, input_size=64,
                   dyn_mode=("layer",) * 4)
    rng = np.random.default_rng(7)
    x0 = jnp.asarray(rng.standard_normal((1, 64, 64, 3)) * 2, jnp.float32)
    v = jax.jit(lambda: m.init({"params": jax.random.PRNGKey(1)},
                               x0, 1.0, training=False))()
    # fixture sanity: find a second image taking a DIFFERENT number of
    # blocks, otherwise batch-0 leakage would be invisible
    ls = jax.jit(build_layer_skip_resnet(v, m.layers))
    n0 = int(ls(x0)[1])
    x1 = None
    for scale in (0.1, 0.5, 1.0, 4.0, 8.0):
        cand = jnp.asarray(rng.standard_normal((1, 64, 64, 3)) * scale,
                           jnp.float32)
        if int(ls(cand)[1]) != n0:
            x1 = cand
            break
    assert x1 is not None, "no divergent fixture image found"
    x = jnp.concatenate([x0, x1], axis=0)

    mesh = Mesh(np.asarray(jax.devices()[:2]), ("data",))
    engine = ServingEngine(m, v, batch_size=1, mesh=mesh)

    def fake_plan(name, **kw):
        from laudnet_tpu.sim.plan import ExecutionPlan
        return ExecutionPlan(
            kind="resnet", mode="layerskip", predicted_latency=1.0,
            dense_latency=2.0, predicted_speedup=2.0,
            ranking={"dense-masked": 2.0, "layerskip": 1.0}, exact=True,
        )

    monkeypatch.setattr(plan_mod, "plan_resnet_serving", fake_plan)
    plan = engine.calibrate([x[:1]])
    assert plan.served == "layerskip"
    ref = m.apply(v, x, 0.1, training=False).logits
    np.testing.assert_allclose(np.asarray(engine(x)), np.asarray(ref),
                               rtol=2e-4, atol=2e-4)


def test_serving_engine_compiles_static_export_with_fidelity_gate():
    """VERDICT r4 #5: the engine COMPILES its static-export
    recommendation (served == mode) and gates it on measured calibration
    fidelity — a threshold above the measured agreement demotes the plan
    to dense-masked with the rejection recorded."""
    from laudnet_tpu.models import LAUDResNet

    m = LAUDResNet(layers=(3, 4, 6, 3), num_classes=10, input_size=64,
                   dyn_mode=("channel",) * 4,
                   channel_dyn_granularity=(2, 2, 2, 2),
                   channel_masker=("MLP",) * 4,
                   channel_masker_layers=(2, 2, 2, 2))
    x = jax.random.normal(jax.random.PRNGKey(0), (4, 64, 64, 3))
    v = m.init({"params": jax.random.PRNGKey(1)}, x, 1.0, training=False)
    # input-dependent ~50% policy (bench.py --r101-static scheme): zero
    # the masker biases, scale the final kernel so per-image margins
    # dominate — the majority-vote mask is then a real approximation
    params = jax.device_get(v["params"])
    for s, d in enumerate((3, 4, 6, 3)):
        for b in range(d):
            fc2 = params[f"layer{s + 1}_{b}"]["masker_channel"]["fc2"]
            params[f"layer{s + 1}_{b}"]["masker_channel"]["fc2"] = {
                "kernel": fc2["kernel"] * 30.0,
                "bias": np.zeros_like(fc2["bias"]),
            }
    v = {"params": params, "batch_stats": v["batch_stats"]}

    engine = ServingEngine(m, v)
    plan = engine.calibrate([x], allow_static_export=True,
                            fidelity_threshold=0.5)
    assert plan.mode == "static-export"
    assert plan.served == plan.mode  # the loop is CLOSED
    assert not plan.exact
    assert plan.fidelity is not None
    assert 0.5 <= plan.fidelity["mean_agreement"] <= 1.0
    y = engine(x)
    assert y.shape == (4, 10) and np.isfinite(np.asarray(y)).all()

    # impossible threshold: the same recommendation is REJECTED and the
    # plan demotes honestly
    engine2 = ServingEngine(m, v)
    plan2 = engine2.calibrate([x], allow_static_export=True,
                              fidelity_threshold=1.01)
    assert plan2.mode == "dense-masked" and plan2.served == "dense-masked"
    assert plan2.exact and "rejected" in plan2.notes
    assert "static-export" in plan2.ranking  # candidate stays visible
    ref = m.apply(v, x, 0.1, training=False).logits
    np.testing.assert_allclose(np.asarray(engine2(x)), np.asarray(ref),
                               rtol=1e-4, atol=1e-4)


def test_plan_pallas_is_rank_only():
    """'pallas' appears in the spatial ranking for transparency but can
    never be CHOSEN (no full-model serving integration; loses at stock
    R101 widths — BASELINE.md appendix)."""
    plan = plan_resnet_serving("resnet101", dyn_mode="spatial",
                               act_rate=0.05)
    assert "pallas" in plan.ranking
    assert plan.mode != "pallas"
