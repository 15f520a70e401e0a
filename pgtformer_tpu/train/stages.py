"""The four-stage training recipe, as jitted data-parallel train steps.

Reconstruction of the reference's BasicSR-fork trainers (`TRQVAEModel` /
`TRQCodeFormerModel` — named in options/*.yml but absent from the repo;
SURVEY.md §2.8, §3.2-3.4):

  * stage I   — TDCRQVAE3 VQGAN pretrain: L1 + LPIPS + 0.25*commitment +
                hinge GAN (options/release_train_stage_I_...yml:130-145).
  * stage II  — code prediction: CE(logits, teacher codes)*0.5 +
                MSE(lq_feat, teacher z_q)*1.0, `code_only`
                (..._stage_II_...yml:170-178).
  * stage III — full PGTFormer + GAN: CE + feat L1 + pixel L1 + LPIPS +
                hinge 0.75, frozen {quantizer, decoder, conditionnet}.
  * stage IV  — alignment-free fine-tune: FocalLoss + GRADL1 + TemporalLPIPS
                (..._stage_IIII_...yml:170-199).

Each step runs per-device under `shard_map` over the `data` mesh axis:
gradients are `psum`'d (DDP equivalent) and the stage-I codebook EMA psums
its cluster statistics over the same axis (reference's custom NCCL
collectives — tdcrqvae3_arch.py:157-171).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Callable, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import optax
from flax.core import unfreeze
from jax.sharding import Mesh, PartitionSpec as P
from jax import shard_map

from pgtformer_tpu.config import VQVAEConfig, PGTFormerConfig
from pgtformer_tpu.models.vae import TDCRQVAE3
from pgtformer_tpu.models.pgtformer import PGTFormer
from pgtformer_tpu.models.vqgan import VQGANDiscriminator
from pgtformer_tpu.parallel.mesh import DATA_AXIS
from pgtformer_tpu.train import losses as L
from pgtformer_tpu.train.ema import ema_update, ema_init
from pgtformer_tpu.train.schedule import multistep_with_warmup, make_adam
from pgtformer_tpu.train.state import TrainState, GeneratorState, DiscriminatorState
from pgtformer_tpu.registry import MODEL_REGISTRY


@dataclass(frozen=True)
class StageHyper:
    """Per-stage hyperparameters (YAML `train:` subtree)."""
    lr_g: float = 4e-5
    lr_d: float = 4e-5
    betas: Tuple[float, float] = (0.5, 0.9)
    milestones: Tuple[int, ...] = (800000,)
    gamma: float = 0.5
    warmup_iter: int = -1
    total_iter: int = 800000
    ema_decay: float = 0.999
    gan_start_iter: int = -1
    gan_weight: float = 0.75
    # stage II+ options
    token_loss: str = "ce"          # "ce" | "focal"
    token_weight: float = 0.5
    feat_loss: str = "mse"          # "mse" | "l1"
    feat_weight: float = 1.0
    feat_target: str = "zq"         # "zq" (teacher quantized) | "ze" (pre-VQ)
    pixel_loss: str = "l1"          # "l1" | "gradl1" | "none"
    pixel_weight: float = 1.0
    lossmulti: Tuple[float, ...] = (0.2, 0.05, 0.05)
    perceptual: str = "lpips"       # "lpips" | "temporal_lpips" | "none"
    tgrad_weight: float = 0.8
    use_gan: bool = True
    # "fixed": constant gan_weight; "adaptive": taming-style last-layer
    # gradient-norm ratio (reference exposes get_last_layer for this —
    # pgtformer_arch.py:592-596); costs two extra short backward passes
    gan_weight_mode: str = "fixed"


STAGE_HYPERS = {
    "I": StageHyper(lr_g=4e-5, lr_d=4e-5, milestones=(800000,),
                    warmup_iter=20000, total_iter=800000),
    "II": StageHyper(lr_g=8e-5, lr_d=8e-5, milestones=(400000,),
                     total_iter=400000, use_gan=False, token_loss="ce",
                     feat_loss="mse", pixel_loss="none", perceptual="none"),
    "III": StageHyper(lr_g=2e-5, lr_d=2e-5, milestones=(200000,),
                      total_iter=200000, token_loss="ce", feat_loss="mse",
                      pixel_loss="l1", perceptual="lpips", gan_weight=1.0),
    "IV": StageHyper(lr_g=2e-5, lr_d=2e-5, milestones=(200000,),
                     total_iter=200000, token_loss="focal", feat_loss="l1",
                     pixel_loss="gradl1", perceptual="temporal_lpips"),
}


def _psum_if(tree, axis_name):
    if axis_name is None:
        return tree
    return jax.lax.psum(tree, axis_name)


def _pmean_if(tree, axis_name):
    if axis_name is None:
        return tree
    return jax.lax.pmean(tree, axis_name)


def _flat_frames(x):
    """[B, T, H, W, C] -> [B*T, H, W, C]."""
    B, T = x.shape[:2]
    return x.reshape(B * T, *x.shape[2:])


def _dequantize(batch):
    """uint8 [0,255] -> float32 [0,1] *on device*, inside the jitted step.

    Lets the loader ship 4x-smaller uint8 batches over the host->device
    link (the serving path's unique-frame uint8 upload, pipeline.py);
    the cast fuses into the first consumer op.  Float inputs pass
    through untouched, so float-batch callers are unaffected."""
    return jax.tree.map(
        lambda a: (a.astype(jnp.float32) / 255.0
                   if a.dtype == jnp.uint8 else a), batch)


def trainable_mask(params, frozen_top_level: Sequence[str]):
    """optax mask: True (trainable) for every leaf not under a frozen
    top-level module (the reference's `fix_modules` freeze —
    pgtformer_arch.py:558-575)."""
    frozen = set(frozen_top_level)

    def mark(tree, is_frozen):
        if isinstance(tree, dict):
            return {k: mark(v, is_frozen or k in frozen)
                    for k, v in tree.items()}
        return not is_frozen

    return mark(unfreeze(params) if hasattr(params, "keys") else params, False)


def _replace_leaf(params, path: Tuple[str, ...], value):
    from flax import traverse_util
    flat = traverse_util.flatten_dict(unfreeze(params))
    flat[path] = value
    return traverse_util.unflatten_dict(flat)


def _get_leaf(params, path: Tuple[str, ...]):
    node = params
    for p in path:
        node = node[p]
    return node


def _adaptive_gan_weight(nll_of_kernel, gan_of_kernel, kernel,
                         max_weight=1e4):
    """taming's calculate_adaptive_weight: ||d nll / d last_layer|| /
    ||d g_gan / d last_layer||, computed by differentiating the losses wrt
    the last layer's kernel only (cotangents flow just through the model
    tail + loss networks; XLA CSEs the shared primal forward)."""
    g_nll = jax.grad(nll_of_kernel)(kernel)
    g_gan = jax.grad(gan_of_kernel)(kernel)
    n = jnp.linalg.norm(g_nll.astype(jnp.float32))
    g = jnp.linalg.norm(g_gan.astype(jnp.float32))
    return jax.lax.stop_gradient(jnp.clip(n / (g + 1e-4), 0.0, max_weight))


# --------------------------------------------------------------------------
# Stage I — TDCRQVAE3 VQGAN pretrain
# --------------------------------------------------------------------------

@MODEL_REGISTRY.register(name="TRQVAEModel")
class Stage1Trainer:
    """VQGAN pretrain of the temporal RQ-VAE (reference stage I)."""

    def __init__(self, cfg: VQVAEConfig, hp: StageHyper = STAGE_HYPERS["I"],
                 lpips_fn: Optional[Callable] = None,
                 mesh: Optional[Mesh] = None, dtype=jnp.float32,
                 disc: Optional[VQGANDiscriminator] = None,
                 use_pallas: bool = False):
        self.cfg = cfg
        self.hp = hp
        self.mesh = mesh
        self.axis = DATA_AXIS if mesh is not None else None
        self.model = TDCRQVAE3(cfg, axis_name=self.axis, dtype=dtype,
                               use_pallas=use_pallas)
        # n_layers=4 halves resolution 4x; inputs below ~64px need a
        # shallower PatchGAN or the logits map collapses to zero size
        # clone(axis_name=...): SyncBN across the data axis (reference
        # `syncbn: true` converts net_d too) — without it per-shard batch
        # stats make the sharded GAN step diverge from single-device
        self.disc = (disc or VQGANDiscriminator(dtype=dtype)).clone(
            axis_name=self.axis)
        self.lpips_fn = lpips_fn
        self.hinge = L.HingeGANLoss("hinge", hp.gan_weight)
        sched = multistep_with_warmup(hp.lr_g, hp.milestones, hp.gamma,
                                      hp.warmup_iter)
        self.opt_g = make_adam(sched, hp.betas)
        sched_d = multistep_with_warmup(hp.lr_d, hp.milestones, hp.gamma,
                                        hp.warmup_iter)
        self.opt_d = make_adam(sched_d, hp.betas)
        self._step_fn = None

    def init_state(self, rng: jax.Array, sample_gt: jnp.ndarray) -> TrainState:
        sample_gt = _dequantize(sample_gt)
        rng, r1, r2, r3 = jax.random.split(rng, 4)
        # jitted init: eager init of the full 512px model over the axon TPU
        # tunnel pays ~1ms RPC per op (many minutes); jit makes it one call
        g_vars = jax.jit(lambda a, b: self.model.init(
            {"params": a, "restart": b}, sample_gt))(r1, r3)
        d_vars = jax.jit(lambda k: self.disc.init(
            k, _flat_frames(sample_gt), train=False))(r2)
        g = GeneratorState(
            params=g_vars["params"], ema_params=ema_init(g_vars["params"]),
            opt_state=self.opt_g.init(g_vars["params"]),
            codebook=g_vars["codebook"])
        d = DiscriminatorState(
            params=d_vars["params"],
            opt_state=self.opt_d.init(d_vars["params"]),
            batch_stats=d_vars.get("batch_stats"))
        return TrainState(step=jnp.zeros((), jnp.int32), g=g, d=d, rng=rng)

    # -- per-device step ----------------------------------------------------
    def _per_device_step(self, state: TrainState, gt: jnp.ndarray):
        hp = self.hp
        axis = self.axis
        state, rng = state.next_rng()
        gt = _dequantize(gt)
        gt_flat = _flat_frames(gt)

        def g_loss_fn(g_params):
            variables = {"params": g_params, "codebook": state.g.codebook}
            (out, quant_loss, codes), upd = self.model.apply(
                variables, gt, train=True, mutable=["codebook"],
                rngs={"restart": rng})
            l_pix = L.l1_loss(out, gt_flat)
            l_percep = (jnp.mean(self.lpips_fn(out, gt_flat))
                        if self.lpips_fn is not None else 0.0)
            nll = l_pix + l_percep + self.cfg.latent_loss_weight * quant_loss

            gan_on = jnp.asarray(state.step >= hp.gan_start_iter, jnp.float32)
            d_vars = {"params": state.d.params}
            mut_d = []
            if state.d.batch_stats is not None:
                d_vars["batch_stats"] = state.d.batch_stats
                mut_d = ["batch_stats"]
            # train=True: the reference keeps net_d in train mode for the
            # generator's adversarial pass too (BasicSR never .eval()s it),
            # so G's logits use BATCH statistics.  Running-average logits
            # diverge wildly from train-mode logits early on (momentum-0.9
            # stats lag) and feed G a signal D never actually produces —
            # measured: l_d -> 0 while l_g_gan -> -3 and val-PSNR stalls.
            # The torch side effect (the G fake pass advances running
            # stats) is reproduced by threading d_upd into the D step.
            fake_logits, d_upd = self.disc.apply(d_vars, out, train=True,
                                                 mutable=mut_d)
            l_gan = self.hinge.g_loss(fake_logits)
            g_bs = d_upd.get("batch_stats", state.d.batch_stats)

            d_weight = 1.0
            if hp.gan_weight_mode == "adaptive":
                # reference get_last_layer(): decoder.conv_out.weight
                # (tdcrqvae3_arch.py:847-848)
                path = ("decoder", "conv_out", "kernel")

                def out_of_k(k):
                    p2 = _replace_leaf(g_params, path, k)
                    o, _, _ = self.model.apply(
                        {"params": p2, "codebook": state.g.codebook}, gt)
                    return o

                def nll_of_k(k):
                    o = out_of_k(k)
                    r = L.l1_loss(o, gt_flat)
                    if self.lpips_fn is not None:
                        r = r + jnp.mean(self.lpips_fn(o, gt_flat))
                    return r

                def gan_of_k(k):
                    lg, _ = self.disc.apply(d_vars, out_of_k(k), train=True,
                                            mutable=mut_d)
                    return self.hinge.g_loss(lg)

                d_weight = _adaptive_gan_weight(
                    nll_of_k, gan_of_k, _get_leaf(g_params, path))

            total = nll + gan_on * d_weight * l_gan
            metrics = {"l_pix": l_pix, "l_percep": l_percep,
                       "l_quant": quant_loss, "l_g_gan": l_gan}
            if hp.gan_weight_mode == "adaptive":
                metrics["d_weight"] = d_weight
            return total, (upd["codebook"], metrics, out, g_bs)

        (g_total, (new_codebook, metrics, out, g_bs)), g_grads = \
            jax.value_and_grad(g_loss_fn, has_aux=True)(state.g.params)
        g_grads = _pmean_if(g_grads, axis)
        updates, new_g_opt = self.opt_g.update(g_grads, state.g.opt_state,
                                               state.g.params)
        new_g_params = optax.apply_updates(state.g.params, updates)
        new_g_ema = ema_update(state.g.ema_params, new_g_params, hp.ema_decay)

        # -- discriminator step --
        fake = jax.lax.stop_gradient(out)

        def d_loss_fn(d_params):
            # stats start from g_bs: the G pass already advanced the
            # running averages (torch train-mode side effect)
            d_vars = {"params": d_params}
            mutable = []
            if g_bs is not None:
                d_vars["batch_stats"] = g_bs
                mutable = ["batch_stats"]
            real_logits, bs1 = self.disc.apply(d_vars, gt_flat, train=True,
                                               mutable=mutable)
            d_vars2 = {"params": d_params,
                       "batch_stats": bs1.get("batch_stats", g_bs)}
            fake_logits, bs2 = self.disc.apply(d_vars2, fake, train=True,
                                               mutable=mutable)
            loss = self.hinge.d_loss(real_logits, fake_logits)
            return loss, bs2.get("batch_stats", g_bs)

        (d_total, new_bs), d_grads = jax.value_and_grad(
            d_loss_fn, has_aux=True)(state.d.params)
        d_grads = _pmean_if(d_grads, axis)
        d_updates, new_d_opt = self.opt_d.update(d_grads, state.d.opt_state,
                                                 state.d.params)
        new_d_params = optax.apply_updates(state.d.params, d_updates)

        metrics = {**metrics, "l_g_total": g_total, "l_d": d_total}
        metrics = _pmean_if(metrics, axis)

        new_state = state.replace(
            step=state.step + 1,
            g=state.g.replace(params=new_g_params, ema_params=new_g_ema,
                              opt_state=new_g_opt, codebook=new_codebook),
            d=state.d.replace(params=new_d_params, opt_state=new_d_opt,
                              batch_stats=new_bs))
        return new_state, metrics

    def make_step(self):
        """Build the jitted (and, with a mesh, shard_map'ed) train step."""
        if self._step_fn is not None:
            return self._step_fn
        if self.mesh is None:
            self._step_fn = jax.jit(self._per_device_step)
        else:
            mapped = shard_map(
                self._per_device_step, mesh=self.mesh,
                in_specs=(P(), P(DATA_AXIS)), out_specs=(P(), P()),
                check_vma=False)
            self._step_fn = jax.jit(mapped)
        return self._step_fn


# --------------------------------------------------------------------------
# Stages II / III / IV — PGTFormer
# --------------------------------------------------------------------------

@MODEL_REGISTRY.register(name="TRQCodeFormerModel")
class PGTFormerTrainer:
    """Code-prediction (II) and end-to-end GAN (III/IV) stages.

    Teacher = frozen stage-I TDCRQVAE3 (`network_gt` in the YAMLs); student
    = PGTFormer with {quantizer, decoder, conditionnet} frozen via an optax
    mask (reference fix_modules — pgtformer_arch.py:493).
    """

    def __init__(self, cfg: PGTFormerConfig, stage: str = "III",
                 hp: Optional[StageHyper] = None,
                 lpips_fn: Optional[Callable] = None,
                 mesh: Optional[Mesh] = None, dtype=jnp.float32,
                 disc: Optional[VQGANDiscriminator] = None,
                 use_pallas: bool = False):
        assert stage in ("II", "III", "IV")
        self.cfg = cfg
        self.stage = stage
        self.hp = hp or STAGE_HYPERS[stage]
        self.mesh = mesh
        self.axis = DATA_AXIS if mesh is not None else None
        self.code_only = stage == "II"
        self.model = PGTFormer(cfg, axis_name=self.axis, dtype=dtype,
                               use_pallas=use_pallas)
        self.teacher = TDCRQVAE3(cfg.vqvae, dtype=dtype)
        # SyncBN across the data axis (see Stage1Trainer)
        self.disc = (disc or VQGANDiscriminator(dtype=dtype)).clone(
            axis_name=self.axis)
        self.lpips_fn = lpips_fn
        self.hinge = L.HingeGANLoss("hinge", self.hp.gan_weight)
        self._step_fn = None
        self._opts = None

    def _build_opts(self, g_params):
        hp = self.hp
        frozen = [m for m in self.cfg.fix_modules if m != "quantizer"]
        if "decoder" in frozen:
            frozen.append("post_quant_conv")
        mask = trainable_mask(g_params, frozen)
        # optax.masked would pass raw gradients through for frozen leaves;
        # multi_transform + set_to_zero actually freezes them
        labels = jax.tree.map(lambda m: "train" if m else "frozen", mask)
        sched = multistep_with_warmup(hp.lr_g, hp.milestones, hp.gamma,
                                      hp.warmup_iter)
        opt_g = optax.multi_transform(
            {"train": make_adam(sched, hp.betas),
             "frozen": optax.set_to_zero()}, labels)
        sched_d = multistep_with_warmup(hp.lr_d, hp.milestones, hp.gamma,
                                        hp.warmup_iter)
        opt_d = make_adam(sched_d, hp.betas)
        return opt_g, opt_d

    def init_state(self, rng: jax.Array, sample_lq: jnp.ndarray,
                   teacher_variables, student_variables=None) -> TrainState:
        sample_lq = _dequantize(sample_lq)
        rng, r1, r2 = jax.random.split(rng, 3)
        if student_variables is None:
            # always init the FULL structure (w>0, not code_only) so stage-II
            # checkpoints carry the frozen decoder/quantizer like the
            # reference's (its stage-II state dicts contain every module);
            # jitted: eager init over the axon tunnel is minutes of per-op RPC
            student_variables = jax.jit(lambda k: self.model.init(
                {"params": k}, sample_lq, w=1.0, code_only=False))(r1)
        self.teacher_variables = teacher_variables
        g_params = student_variables["params"]
        self._opts = self._build_opts(g_params)
        opt_g, opt_d = self._opts
        g = GeneratorState(
            params=g_params, ema_params=ema_init(g_params),
            opt_state=opt_g.init(g_params),
            # stage II (code_only) never touches the quantizer, so the
            # codebook collection may be absent from the init
            codebook=student_variables.get("codebook"),
            batch_stats=student_variables.get("batch_stats"))
        d = None
        if self.hp.use_gan:
            d_vars = jax.jit(lambda k: self.disc.init(
                k, _flat_frames(sample_lq), train=False))(r2)
            d = DiscriminatorState(
                params=d_vars["params"],
                opt_state=opt_d.init(d_vars["params"]),
                batch_stats=d_vars.get("batch_stats"))
        return TrainState(step=jnp.zeros((), jnp.int32), g=g, d=d, rng=rng)

    def _student_vars(self, g_params, state):
        v = {"params": g_params}
        if state.g.codebook is not None:
            v["codebook"] = state.g.codebook
        if state.g.batch_stats is not None:
            v["batch_stats"] = state.g.batch_stats
        return v

    def _per_device_step(self, state: TrainState, batch):
        hp = self.hp
        axis = self.axis
        batch = _dequantize(batch)
        lq, gt = batch["lq"], batch["gt"]
        gt_flat = _flat_frames(gt)
        B, T = gt.shape[:2]

        # teacher targets (frozen; no grad)
        t_z = self.teacher.apply(self.teacher_variables, gt,
                                 method=TDCRQVAE3.encode)
        t_zq, _, t_codes = self.teacher.apply(
            self.teacher_variables, t_z, method=lambda m, z: m.quantizer(z))
        t_codes = jax.lax.stop_gradient(t_codes)
        t_feat = jax.lax.stop_gradient(
            t_zq if hp.feat_target == "zq" else t_z)

        def g_loss_fn(g_params):
            g_bs = state.d.batch_stats if state.d is not None else None
            variables = self._student_vars(g_params, state)
            if self.code_only:
                logits, lq_feat = self.model.apply(
                    variables, lq, code_only=True)
                out = None
            else:
                out, logits, lq_feat = self.model.apply(
                    variables, lq, w=self.cfg.w, detach_16=True,
                    adain=self.cfg.adain)

            if hp.token_loss == "focal":
                l_token = L.focal_loss(logits, t_codes,
                                       loss_weight=hp.token_weight)
            else:
                l_token = L.cross_entropy_loss(logits, t_codes,
                                               loss_weight=hp.token_weight)
            if hp.feat_loss == "l1":
                l_feat = L.l1_loss(lq_feat, t_feat,
                                   loss_weight=hp.feat_weight)
            else:
                l_feat = L.mse_loss(lq_feat, t_feat,
                                    loss_weight=hp.feat_weight)
            total = l_token + l_feat
            metrics = {"l_token": l_token, "l_feat": l_feat}

            if out is not None:
                out5 = out.reshape(B, T, *out.shape[1:])
                if hp.pixel_loss == "gradl1":
                    l_pix = L.grad_l1_loss(out5, gt, hp.pixel_weight,
                                           hp.lossmulti, T)
                elif hp.pixel_loss == "l1":
                    l_pix = L.l1_loss(out, gt_flat, hp.pixel_weight)
                else:
                    l_pix = 0.0
                if hp.perceptual == "temporal_lpips" and self.lpips_fn:
                    l_percep = L.temporal_lpips_loss(
                        self.lpips_fn, out5, gt, T, hp.tgrad_weight)
                elif hp.perceptual == "lpips" and self.lpips_fn:
                    l_percep = jnp.mean(self.lpips_fn(out, gt_flat))
                else:
                    l_percep = 0.0
                total = total + l_pix + l_percep
                metrics.update({"l_pix": l_pix, "l_percep": l_percep})

                if hp.use_gan and state.d is not None:
                    d_vars = {"params": state.d.params}
                    mut_d = []
                    if state.d.batch_stats is not None:
                        d_vars["batch_stats"] = state.d.batch_stats
                        mut_d = ["batch_stats"]
                    # train=True + stat threading: see Stage1Trainer — the
                    # reference's net_d stays in train mode for the G pass
                    fake_logits, d_upd = self.disc.apply(
                        d_vars, out, train=True, mutable=mut_d)
                    l_gan = self.hinge.g_loss(fake_logits)
                    g_bs = d_upd.get("batch_stats", state.d.batch_stats)
                    gan_on = jnp.asarray(state.step >= hp.gan_start_iter,
                                         jnp.float32)
                    d_weight = 1.0
                    if hp.gan_weight_mode == "adaptive":
                        # reference get_last_layer() with frozen decoder:
                        # last fuse block's encode_enc.conv2
                        # (pgtformer_arch.py:592-596)
                        path = (f"fuse_convs_{self.cfg.connect_list[-1]}",
                                "encode_enc", "conv2", "kernel")

                        def out_of_k(k):
                            p2 = _replace_leaf(g_params, path, k)
                            o, _, _ = self.model.apply(
                                self._student_vars(p2, state), lq,
                                w=self.cfg.w, detach_16=True,
                                adain=self.cfg.adain)
                            return o

                        def nll_of_k(k):
                            o = out_of_k(k)
                            r = L.l1_loss(o, gt_flat)
                            if self.lpips_fn is not None:
                                r = r + jnp.mean(self.lpips_fn(o, gt_flat))
                            return r

                        def gan_of_k(k):
                            lg, _ = self.disc.apply(d_vars, out_of_k(k),
                                                    train=True, mutable=mut_d)
                            return self.hinge.g_loss(lg)

                        d_weight = _adaptive_gan_weight(
                            nll_of_k, gan_of_k, _get_leaf(g_params, path))
                        metrics["d_weight"] = d_weight
                    total = total + gan_on * d_weight * l_gan
                    metrics["l_g_gan"] = l_gan
            return total, (metrics, out, g_bs)

        state, rng = state.next_rng()
        (g_total, (metrics, out, g_bs)), g_grads = jax.value_and_grad(
            g_loss_fn, has_aux=True)(state.g.params)
        g_grads = _pmean_if(g_grads, axis)
        opt_g, opt_d = self._opts
        updates, new_g_opt = opt_g.update(g_grads, state.g.opt_state,
                                          state.g.params)
        new_g_params = optax.apply_updates(state.g.params, updates)
        new_g_ema = ema_update(state.g.ema_params, new_g_params, hp.ema_decay)
        new_g = state.g.replace(params=new_g_params, ema_params=new_g_ema,
                                opt_state=new_g_opt)
        new_d = state.d
        metrics["l_g_total"] = g_total

        if out is not None and hp.use_gan and state.d is not None:
            fake = jax.lax.stop_gradient(out)

            def d_loss_fn(d_params):
                # stats start from g_bs (the G pass already advanced them)
                d_vars = {"params": d_params}
                mutable = []
                if g_bs is not None:
                    d_vars["batch_stats"] = g_bs
                    mutable = ["batch_stats"]
                real_logits, bs1 = self.disc.apply(d_vars, gt_flat,
                                                   train=True,
                                                   mutable=mutable)
                d_vars2 = {"params": d_params,
                           "batch_stats": bs1.get("batch_stats", g_bs)}
                fake_logits, bs2 = self.disc.apply(d_vars2, fake, train=True,
                                                   mutable=mutable)
                return (self.hinge.d_loss(real_logits, fake_logits),
                        bs2.get("batch_stats", g_bs))

            (d_total, new_bs), d_grads = jax.value_and_grad(
                d_loss_fn, has_aux=True)(state.d.params)
            d_grads = _pmean_if(d_grads, axis)
            d_updates, new_d_opt = opt_d.update(d_grads, state.d.opt_state,
                                                state.d.params)
            new_d = state.d.replace(
                params=optax.apply_updates(state.d.params, d_updates),
                opt_state=new_d_opt, batch_stats=new_bs)
            metrics["l_d"] = d_total

        metrics = _pmean_if(metrics, axis)
        new_state = state.replace(step=state.step + 1, g=new_g, d=new_d)
        return new_state, metrics

    def make_step(self):
        if self._step_fn is not None:
            return self._step_fn
        if self.mesh is None:
            self._step_fn = jax.jit(self._per_device_step)
        else:
            mapped = shard_map(
                self._per_device_step, mesh=self.mesh,
                in_specs=(P(), P(DATA_AXIS)), out_specs=(P(), P()),
                check_vma=False)
            self._step_fn = jax.jit(mapped)
        return self._step_fn
