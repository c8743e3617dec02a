"""Latency-aware serving engine: calibrate -> predict -> compile -> serve.

This is the deployment-facing composition of the framework — the LAUDNet
loop ("let the hardware model pick the execution form") packaged as one
object. For a trained LAUD-ViT it measures the policy's realized per-block
keeps on calibration data, asks the TPU latency model whether fixed-capacity
token selection beats the dense-masked graph, and compiles the winner; for
a LAUD-ResNet it ranks dense-masked vs layer-skip vs (opt-in, inexact)
static channel export. Every path served by default is policy-exact —
nothing is dropped, frozen or quantized relative to the masked training
graph on inputs whose realized keeps the calibrated budgets cover. The
ViT block kernels default to fast-math bodies (~5e-4 bounded logit
deviation, recorded on ``plan.fast_math``; pass ``fast_math=False`` for
the bit-exact bodies).

Typical use::

    engine = ServingEngine(model, variables)           # LAUDViT
    plan = engine.calibrate(calibration_batches)       # ExecutionPlan
    logits = engine(batch)                             # compiled winner
"""

from __future__ import annotations

from typing import Any, Callable, Iterable, Optional

import jax
import jax.numpy as jnp


class ServingEngine:
    """Compile-once serving wrapper around a trained LAUD model.

    ``model`` is a :class:`~laudnet_tpu.models.laud_vit.LAUDViT` or a
    LAUD-ResNet (`models/laud_resnet.py`); ``variables`` its trained
    params/batch_stats. ``temperature`` is the eval gate temperature
    (``t_last``). Before :meth:`calibrate` the engine serves the exact
    dense-masked graph; after it, the planned winner.
    """

    def __init__(self, model, variables, *, temperature: float = 0.1,
                 spec: str = "v5e", batch_size: int = 128, mesh=None,
                 snap_capacities: bool = False, fast_math: bool = True):
        """``mesh``: optional 1-D :class:`jax.sharding.Mesh` — serve
        data-parallel over its devices (the TPU-native scale-out: batch
        sharded on the mesh axis, params replicated, each device runs the
        compiled winner on its shard via ``shard_map``; multi-host callers
        pass per-host batches, see ``parallel.put_global_batch``).
        ``batch_size`` is the PER-CHIP serving batch the latency model
        prices; with a mesh the global batch is ``batch_size * mesh.size``.
        ``snap_capacities`` floors token-selection capacities onto the
        MXU tile grid (`fused_vit.snap_capacity_to_tiles`, measured +8%
        on the DeiT-S schedule) — opt-in because it keeps slightly fewer
        tokens than the model's nominal budgets.
        ``fast_math`` (default ON) serves the block engine with the
        fast-math kernel bodies (deferred softmax normalization, one-pass
        LN, tanh GELU — measured +37% on the dense DeiT-S block,
        `ops/pallas/vit_block.py`): bounded ~5e-4 logit deviation from
        the bit-exact bodies, argmax-preserving on test batches, and
        recorded on ``plan.fast_math``. Pass False for the bit-exact
        kernels (it does NOT affect ``plan.exact``, which tracks policy
        approximations — selection/quantization/freezing).
        """
        self.snap_capacities = snap_capacities
        self.fast_math = fast_math
        self.model = model
        self.mesh = mesh
        if mesh is not None:
            from laudnet_tpu.parallel.mesh import replicate

            variables = replicate(variables, mesh)
        self.variables = variables
        self.temperature = temperature
        self.spec = spec
        self.batch_size = batch_size
        self.plan = None
        self._kind = ("vit" if type(model).__name__ == "LAUDViT"
                      else "resnet")
        self._fwd = self._compile(self.model)

    def _jit(self, fn) -> Callable:
        """jit for single-device serving; jit(shard_map(fn)) over the data
        axis when a mesh is attached (explicit per-shard mapping rather
        than relying on the SPMD partitioner — Pallas calls inside ``fn``
        partition trivially along the batch grid this way)."""
        if self.mesh is None:
            return jax.jit(fn)
        from jax.sharding import PartitionSpec as P

        ax = self.mesh.axis_names[0]
        return jax.jit(jax.shard_map(fn, mesh=self.mesh, in_specs=P(ax),
                                     out_specs=P(ax), check_vma=False))

    def _block_engine_ok(self, model) -> bool:
        """The fully fused block engine (`infer/fused_vit.py`) serves
        dense/token-selection/head-gated models with 128-aligned head
        pairs (head gates apply inside the kernel as lane-expanded
        multiplies); layer gating modulates the residual structure, so
        those models keep the attention-only fusion."""
        # a token-gating model without capacities must keep the flax graph:
        # the block engine only applies the eval token gate on the
        # selection path (token_capacity set)
        token_ok = (not getattr(model, "token_skip", False)
                    or getattr(model, "token_capacity", None) is not None)
        # geometry: head pairs must be 128-lane-aligned; odd head counts
        # (T2T's 7) are fine — the engine pads a zero fake head at build
        # time (`fused_vit.py::_pad_fake_head`). Both stems serve (the
        # t2t performer stem runs as the engine's prologue).
        return (self._kind == "vit"
                and jax.default_backend() == "tpu"
                and token_ok
                and not getattr(model, "layer_skip", True)
                and getattr(model, "stem", "patch") in ("patch", "t2t")
                and (2 * (model.dim // model.num_heads)) % 128 == 0
                and model.dim % model.num_heads == 0)

    def _compile(self, model, int8: bool = False) -> Callable:
        if self._block_engine_ok(model):
            from laudnet_tpu.infer.fused_vit import build_fused_vit

            return self._jit(build_fused_vit(
                self.variables, depth=model.depth, dim=model.dim,
                num_heads=model.num_heads, patch_size=model.patch_size,
                stem=getattr(model, "stem", "patch"),
                token_capacity=model.token_capacity,
                snap_capacities=self.snap_capacities,
                head_gating=getattr(model, "head_skip", False),
                int8=int8, fast_math=self.fast_math,
            ))
        assert not int8, "int8 serving requires the block engine"
        # otherwise ViTs serve the fused attention kernel on TPU
        # (numerically equivalent; `ops/pallas/vit_attention.py`)
        if (self._kind == "vit" and hasattr(model, "attn_impl")
                and jax.default_backend() == "tpu"):
            model = model.clone(attn_impl="fused")

        def fwd(x):
            return model.apply(self.variables, x, self.temperature,
                               training=False).logits

        return self._jit(fwd)

    # --- planning -----------------------------------------------------------

    def calibrate(self, batches: Iterable, *, quantile: float = 0.99,
                  margin: float = 0.05,
                  allow_static_export: bool = False,
                  allow_int8: bool = False,
                  fidelity_threshold: float = 0.85):
        """Measure the policy on ``batches``, rank execution paths on the
        TPU latency model, and COMPILE the winner — after this returns,
        ``plan.served == plan.mode`` (the calibrate -> predict -> compile
        -> serve loop is closed for every choosable mode). Returns the
        :class:`~laudnet_tpu.sim.plan.ExecutionPlan`.

        ``allow_int8`` lets the plan CHOOSE the W8A8 block-engine
        variants (always ranked when the block engine prices): inexact —
        quantization error, ``plan.exact`` flips False — so it is opt-in
        like ``allow_static_export``; report agreement vs the exact
        engine (``bench.py --int8`` shows how).

        ``allow_static_export`` admits the static channel export
        (`infer/export_pruned.py`) for channel-paradigm CNNs. It freezes
        an input-dependent policy, so it is additionally gated on
        MEASURED calibration fidelity: the majority-vote static masks
        must agree with the dynamic per-image masks on at least
        ``fidelity_threshold`` of channel groups (mean over blocks,
        `infer/calibrate.calibration_fidelity` on the calibration
        batches). Below the threshold the plan DEMOTES to the fastest
        exact choosable path and records the rejection in ``plan.notes``;
        the measured fidelity always lands in ``plan.fidelity``."""
        from laudnet_tpu.sim.plan import plan_resnet_serving, plan_vit_serving

        if self._kind == "vit":
            from laudnet_tpu.infer.calibrate import calibrate_token_capacity

            m = self.model
            seen_size = [None]  # ranked geometry must match the real inputs

            def apply_fn(x):
                seen_size[0] = x.shape[1]
                return m.apply(self.variables, x, self.temperature,
                               training=False)

            keeps = calibrate_token_capacity(apply_fn, batches,
                                             quantile=quantile, margin=margin)
            on_tpu = jax.default_backend() == "tpu"
            # price the implementation that will actually serve: the
            # fully fused block engine for eligible geometries, the
            # attention-only fusion otherwise
            block = self._block_engine_ok(
                m.clone(token_capacity=(1.0,) * m.depth))
            self.plan = plan_vit_serving(
                keeps, depth=m.depth, dim=m.dim, num_heads=m.num_heads,
                mlp_ratio=m.mlp_ratio, patch_size=m.patch_size,
                input_size=seen_size[0] or 224,
                spec=self.spec, batch_size=self.batch_size,
                fused_attention=on_tpu and not block,
                fused_block=on_tpu and block,
                snap_capacities=self.snap_capacities,
                allow_int8=allow_int8 and on_tpu and block,
                # the no-selection alternative the engine would actually
                # serve: the token-gated masked graph for token_skip
                # models, the head-gated graph for head-only gating
                dense_mode=("mask" if getattr(m, "token_skip", False)
                            else "head" if getattr(m, "head_skip", False)
                            else "dense"),
            )
            int8 = self.plan.mode.endswith("-int8")
            eff_mode = (self.plan.mode[:-len("-int8")] if int8
                        else self.plan.mode)
            if eff_mode in ("token", "token-snapped"):
                # token-snapped capacities arrive pre-snapped from the
                # plan; snap_capacity_to_tiles is idempotent, so the
                # engine's snap flag composes harmlessly
                select = m.clone(token_capacity=self.plan.token_capacity)
                self._fwd = self._compile(select, int8=int8)
                self.plan.served = self.plan.mode
            elif int8:
                # dense-int8: the block engine at full capacity with
                # quantized matmuls (gates still multiply inside the
                # kernel for token-gated models)
                self._fwd = self._compile(
                    m.clone(token_capacity=(1.0,) * m.depth)
                    if getattr(m, "token_skip", False) else m, int8=True)
                self.plan.served = self.plan.mode
            elif getattr(m, "token_skip", False):
                # "dense-masked" for a token-gated model means NO
                # selection, not no gates: the served graph keeps the
                # eval token gates. The block engine runs that at full
                # capacity (gates multiply inside the kernel, nothing is
                # dropped) and measurably faster than the attention-fused
                # flax graph, so swap it in when the geometry qualifies.
                if block:
                    self._fwd = self._compile(
                        m.clone(token_capacity=(1.0,) * m.depth))
                self.plan.served = self.plan.mode
            else:
                self.plan.served = self.plan.mode
            self.plan.fast_math = bool(self.fast_math and block
                                       and not int8)
        else:
            # CNN paths: the engine compiles WHATEVER the plan chooses —
            # dense-masked (always), layer-skip at batch 1
            # (`infer/layerskip.py`), spatial fixed-capacity gather
            # execution (`LAUDResNet(execution='sparse')`), and the
            # static channel export behind its fidelity gate
            # (`infer/export_pruned.py`). Only 'pallas' stays rank-only
            # (`sim/plan.py`: no full-model integration, loses at stock
            # R101 widths).
            from laudnet_tpu.sim.plan import ExecutionPlan

            batches = list(batches)  # consumed up to three times below
            modes = (set(self.model.dyn_mode)
                     if hasattr(self.model, "dyn_mode") else {"channel"})
            dyn = next(iter(modes)) if len(modes) == 1 else None
            # measure the policy's realized activation rate on the
            # calibration batches (this is what the ranking is priced at)
            m = self.model
            rates = []
            s3_img = []  # per-stage per-image conv3 spatial densities
            for x in batches:
                out = m.apply(self.variables, jnp.asarray(x),
                              self.temperature, training=False)
                rates.append(float(out.flops_perc.mean()))
                if getattr(out, "spatial_s3_img", None) is not None:
                    s3_img.append([jax.device_get(s)
                                   for s in out.spatial_s3_img])
            act_rate = float(sum(rates) / len(rates)) if rates else 1.0

            depth_map = {16: "resnet50", 33: "resnet101"}
            layers = getattr(self.model, "layers", None)  # RegNets: None
            name = depth_map.get(sum(layers)) if layers else None
            if name is None:
                # no analytic geometry for this depth: serve dense-masked,
                # return an honest no-ranking plan instead of pricing the
                # wrong network
                self.plan = ExecutionPlan(
                    kind="resnet", mode="dense-masked",
                    served="dense-masked", exact=True,
                    predicted_speedup=1.0, ranking={},
                )
            else:
                # mixed per-stage dyn_mode prices each stage at its own
                # paradigm (dense-masked serving); uniform models get the
                # full per-paradigm ranking
                self.plan = plan_resnet_serving(
                    name,
                    dyn_mode=dyn if dyn is not None
                    else tuple(self.model.dyn_mode),
                    act_rate=act_rate, spec=self.spec,
                    batch_size=self.batch_size,
                    allow_static_export=allow_static_export,
                    allow_int8=allow_int8,
                )
                self.plan.served = "dense-masked"
                if self.plan.mode == "dense-masked-int8":
                    # W8A8 convs, per-input gating fully dynamic — the
                    # only approximation is quantization itself
                    self._fwd = self._compile(
                        self.model.clone(conv_impl="int8"))
                    self.plan.served = "dense-masked-int8"
                elif (self.plan.mode == "layerskip"
                        and self.batch_size == 1):
                    from laudnet_tpu.infer.layerskip import (
                        build_layer_skip_resnet,
                    )

                    # _jit, not a bare jax.jit: with a mesh attached the
                    # global batch is mesh.size and the shard_map hands
                    # each device its own (1, H, W, 3) shard — the
                    # builder's batch-1 gating contract holds per device
                    # (a bare jit would gate every image on image 0's
                    # skip decisions)
                    ls = build_layer_skip_resnet(
                        self.variables, self.model.layers)
                    self._fwd = self._jit(lambda x: ls(x)[0])
                    self.plan.served = "layerskip"
                elif self.plan.mode in ("static-export",
                                        "static-export-int8"):
                    # freeze the calibrated majority-vote channel masks
                    # into a real slim network — but only when the
                    # measured per-image fidelity clears the gate
                    # (freezing an input-dependent policy is the one
                    # approximation the engine must quantify, not hide)
                    from laudnet_tpu.infer.calibrate import (
                        calibrate_channel_masks, calibration_fidelity,
                        make_channel_mask_fn,
                    )
                    from laudnet_tpu.infer.export_pruned import (
                        calibrate_export_act_scales, export_pruned_resnet,
                    )

                    mask_fn = make_channel_mask_fn(
                        self.model, self.variables, self.temperature)
                    masks = calibrate_channel_masks(mask_fn, batches)
                    fid = calibration_fidelity(mask_fn, masks, batches)
                    self.plan.fidelity = fid
                    if fid["mean_agreement"] >= fidelity_threshold:
                        in_size = int(jnp.asarray(batches[0]).shape[1])
                        kw = dict(
                            layers=tuple(self.model.layers),
                            channel_dyn_granularity=tuple(
                                self.model.channel_dyn_granularity),
                            input_size=in_size,
                        )
                        if self.plan.mode.endswith("-int8"):
                            scales = calibrate_export_act_scales(
                                self.variables, masks, batches,
                                quantile=1.0, margin=margin, **kw)
                            fwd = export_pruned_resnet(
                                self.variables, masks, int8=True,
                                act_scales=scales, **kw)
                        else:
                            fwd = export_pruned_resnet(
                                self.variables, masks, **kw)
                        self._fwd = self._jit(fwd)
                        self.plan.served = self.plan.mode
                    else:
                        # demote to the fastest exact CHOOSABLE path in
                        # the ranking. static export only exists for the
                        # channel paradigm, whose exact choosable set is
                        # {dense-masked} (layerskip/spatial-capacity
                        # belong to the layer/spatial paradigms), so the
                        # min is computed for robustness, not dispatch:
                        # the engine's init-compiled dense-masked graph
                        # is the fallback it serves
                        exact_choosable = {
                            k: v for k, v in self.plan.ranking.items()
                            if k == "dense-masked"
                            or (k == "layerskip" and self.batch_size == 1)
                            or k == "spatial-capacity"}
                        fb = min(exact_choosable, key=exact_choosable.get)
                        self.plan.notes = (
                            f"static-export rejected: mean mask "
                            f"agreement {fid['mean_agreement']:.3f} < "
                            f"fidelity_threshold {fidelity_threshold}; "
                            f"demoted to {fb}")
                        self.plan.mode = fb
                        self.plan.exact = True
                        self.plan.predicted_latency = exact_choosable[fb]
                        self.plan.predicted_speedup = (
                            self.plan.dense_latency
                            / self.plan.predicted_latency)
                        self.plan.served = fb
                elif self.plan.mode == "spatial-capacity" and s3_img:
                    # fixed patch budgets covering the calibration
                    # quantile of the PER-IMAGE worst-block density per
                    # stage (+margin) — over-budget images fall back to
                    # dropping their least-active patches
                    import numpy as np

                    caps = []
                    for stage in range(len(s3_img[0])):
                        worst = np.concatenate([
                            np.asarray(b[stage]).max(axis=0)
                            for b in s3_img
                        ])
                        caps.append(float(min(
                            1.0, np.quantile(worst, quantile) + margin)))
                    sparse = self.model.clone(
                        execution="sparse", patch_capacity=tuple(caps))
                    self._fwd = self._compile(sparse)
                    self.plan.token_capacity = tuple(caps)
                    self.plan.served = "spatial-capacity"
        return self.plan

    # --- serving --------------------------------------------------------------

    def __call__(self, batch) -> jnp.ndarray:
        return self._fwd(jnp.asarray(batch))
