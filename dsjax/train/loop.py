"""Training / validation loops (SPMD, jit-compiled, device-resident state).

Replaces the reference's PyTorch-Lightning Trainer + DDP runtime
(training.py:42-47, model.py:241-271). One compiled train step does:
forward (bf16 under precision=16) -> log_softmax (f32) -> CTC loss ->
grads -> global-norm clip 400 -> AdamW/SGD update with per-epoch exponential
LR anneal. Batches are sharded over the mesh 'data' axis; parameters follow
the sharding rules in dsjax.parallel (replicated for pure DP); XLA inserts
the gradient all-reduces over ICI — there is no NCCL-style explicit
communication anywhere.

Loss scaling note: the reference computes a per-replica CTC *sum* loss and
DDP averages gradients across replicas. The SPMD-global equivalent is
sum / n_data_shards, which this loop applies, so optimization dynamics match
the reference at any device count.
"""

from __future__ import annotations

import time
from typing import Callable, Dict, Iterable, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from dsjax.config import TrainConfig
from dsjax.data.dataset import Batch
from dsjax.decode.greedy import GreedyDecoder
from dsjax.model.ctc import ctc_loss_auto as ctc_loss
from dsjax.model.ds2 import DeepSpeech2, init_model
from dsjax.parallel.mesh import batch_sharding, make_mesh, param_shardings
from dsjax.train.metrics import CharErrorRate, WordErrorRate, update_batch
from dsjax.train.state import TrainState, epoch_lr, make_optimizer, set_lr


def _limit(n_batches: int, limit: float) -> int:
    if limit is None:
        return n_batches
    if limit <= 1.0:
        return max(1, int(n_batches * limit)) if limit > 0 else 0
    return min(n_batches, int(limit))


class Trainer:
    def __init__(self, cfg: TrainConfig, labels: List[str],
                 mesh: Optional[Mesh] = None):
        self.cfg = cfg
        self.labels = list(labels)
        if cfg.trainer.matmul_precision:
            jax.config.update("jax_default_matmul_precision",
                              cfg.trainer.matmul_precision)
        if cfg.trainer.detect_anomaly:
            # reference parity: Trainer(detect_anomaly=...) passthrough
            jax.config.update("jax_debug_nans", True)
        aug = cfg.data.augmentation
        if aug.spec_augment and aug.spec_augment_device:
            import warnings

            # close the silent-narrowing trap: the device variant applies
            # freq/time masks only (audio/augment.py spec_augment_device)
            warnings.warn(
                "spec_augment_device=true runs SpecAugment's frequency/time "
                "masks inside the compiled step but SKIPS the sparse-image-"
                "warp time warp (host-only). Set spec_augment_device=false "
                "(with device_features=false) to keep the full augmentation.",
                stacklevel=2)
        dtype = jnp.bfloat16 if cfg.trainer.precision == 16 else jnp.float32
        self.model = DeepSpeech2(num_classes=len(labels), spect_cfg=cfg.data.spect,
                                 model_cfg=cfg.model, dtype=dtype)
        self.mesh = mesh or make_mesh(cfg.trainer.mesh_data,
                                      cfg.trainer.mesh_model,
                                      dcn=cfg.trainer.mesh_dcn)
        # total data-parallel shards (batch spans ('dcn', 'data'))
        self.dp = self.mesh.shape["data"] * self.mesh.shape.get("dcn", 1)
        self.tx = make_optimizer(cfg.optim, cfg.trainer)
        self.decoder = GreedyDecoder(labels)
        self._compiled: Dict[Tuple, Callable] = {}
        self._eval_compiled: Dict[Tuple, Callable] = {}

    # ------------------------------------------------------------------
    # state construction / sharding
    # ------------------------------------------------------------------

    def init_state(self, rng: Optional[jax.Array] = None) -> TrainState:
        rng = rng if rng is not None else jax.random.PRNGKey(self.cfg.seed)
        variables = init_model(self.model, rng)
        params = variables["params"]
        batch_stats = variables.get("batch_stats", {})
        opt_state = self.tx.init(params)
        state = TrainState(params=params, batch_stats=batch_stats,
                           opt_state=opt_state,
                           step=jnp.zeros((), jnp.int32),
                           epoch=jnp.zeros((), jnp.int32))
        return self.shard_state(state)

    def state_shardings(self, state: TrainState) -> TrainState:
        p_sh = param_shardings(self.mesh, state.params)
        rep = NamedSharding(self.mesh, P())
        return TrainState(
            params=p_sh,
            batch_stats=jax.tree_util.tree_map(lambda _: rep, state.batch_stats),
            opt_state=jax.tree_util.tree_map(lambda _: rep, state.opt_state),
            step=rep, epoch=rep,
        )

    def shard_state(self, state: TrainState) -> TrainState:
        sh = self.state_shardings(state)
        return jax.tree_util.tree_map(
            lambda x, s: jax.device_put(x, s), state, sh,
            is_leaf=lambda x: x is None)

    # ------------------------------------------------------------------
    # compiled steps
    # ------------------------------------------------------------------

    def _features(self, inputs, input_lengths):
        """Device-feature path: raw (B, L_pad) audio -> (B, F, T) spectrogram
        computed inside the compiled step (dsjax.audio.features)."""
        if inputs.ndim == 2:
            from dsjax.audio.features import spectrogram_jax

            return spectrogram_jax(inputs, input_lengths, self.cfg.data.spect,
                                   normalize=True)
        return inputs

    def _device_augment(self, feats, input_lengths, step):
        """On-device SpecAugment masks (see AugmentationConfig
        .spec_augment_device); keyed by the global step for determinism."""
        aug = self.cfg.data.augmentation
        if not (aug.spec_augment and aug.spec_augment_device):
            return feats
        from dsjax.audio.augment import spec_augment_device

        key = jax.random.fold_in(jax.random.PRNGKey(self.cfg.seed), step)
        return spec_augment_device(feats, input_lengths, key)

    def _train_step_fn(self):
        model, tx, optim_cfg, dp = self.model, self.tx, self.cfg.optim, self.dp

        def step_fn(state: TrainState, inputs, input_lengths, targets,
                    target_lengths, valid):
            feats = self._features(inputs, input_lengths)
            if inputs.ndim == 2:  # raw-audio mode: augment on device
                feats = self._device_augment(feats, input_lengths, state.step)

            def loss_fn(params):
                (out, out_lens, _), mut = model.apply(
                    {"params": params, "batch_stats": state.batch_stats},
                    feats, input_lengths, train=True, mutable=["batch_stats"])
                logp = jax.nn.log_softmax(out.astype(jnp.float32), axis=-1)
                nll = ctc_loss(logp, out_lens, targets, target_lengths,
                               reduction="none", zero_infinity=True)
                # batch-pad rows (Batch.valid=False) carry zero loss/grad
                loss = jnp.sum(nll * valid)
                return loss / dp, mut["batch_stats"]

            (loss, new_stats), grads = jax.value_and_grad(loss_fn, has_aux=True)(state.params)
            opt_state = set_lr(state.opt_state, epoch_lr(optim_cfg, state.epoch))
            updates, opt_state = tx.update(grads, opt_state, state.params)
            params = jax.tree_util.tree_map(lambda p, u: p + u, state.params, updates)
            new_state = TrainState(params=params, batch_stats=new_stats,
                                   opt_state=opt_state, step=state.step + 1,
                                   epoch=state.epoch)
            return new_state, loss

        return step_fn

    # -- gradient accumulation (reference parity: Lightning
    # accumulate_grad_batches) ------------------------------------------

    def _grad_step_fn(self):
        model, dp = self.model, self.dp

        def fn(state: TrainState, inputs, input_lengths, targets,
               target_lengths, valid):
            feats = self._features(inputs, input_lengths)
            if inputs.ndim == 2:
                feats = self._device_augment(feats, input_lengths, state.step)

            def loss_fn(params):
                (out, out_lens, _), mut = model.apply(
                    {"params": params, "batch_stats": state.batch_stats},
                    feats, input_lengths, train=True, mutable=["batch_stats"])
                logp = jax.nn.log_softmax(out.astype(jnp.float32), axis=-1)
                nll = ctc_loss(logp, out_lens, targets, target_lengths,
                               reduction="none", zero_infinity=True)
                loss = jnp.sum(nll * valid)
                return loss / dp, mut["batch_stats"]

            (loss, stats), grads = jax.value_and_grad(loss_fn, has_aux=True)(state.params)
            return grads, stats, loss

        return fn

    def grad_step(self, state: TrainState, batch: Batch):
        args = self.put_batch(batch)
        key = ("grad", args[0].shape, args[2].shape)
        if key not in self._compiled:
            sh = self.state_shardings(state)
            bsh = batch_sharding(self.mesh)
            self._compiled[key] = jax.jit(
                self._grad_step_fn(),
                in_shardings=(sh, bsh, bsh, bsh, bsh, bsh),
                out_shardings=(sh.params, sh.batch_stats,
                               NamedSharding(self.mesh, P())))
        return self._compiled[key](state, *args)

    def apply_grads(self, state: TrainState, grads, n_accum: int) -> TrainState:
        if "apply" not in self._compiled:
            sh = self.state_shardings(state)
            tx, optim_cfg = self.tx, self.cfg.optim

            def fn(state: TrainState, grads, scale):
                grads = jax.tree_util.tree_map(lambda g: g * scale, grads)
                opt_state = set_lr(state.opt_state, epoch_lr(optim_cfg, state.epoch))
                updates, opt_state = tx.update(grads, opt_state, state.params)
                params = jax.tree_util.tree_map(lambda p, u: p + u,
                                                state.params, updates)
                return TrainState(params, state.batch_stats, opt_state,
                                  state.step + 1, state.epoch)

            self._compiled["apply"] = jax.jit(
                fn, in_shardings=(sh, sh.params, None), out_shardings=sh)
        return self._compiled["apply"](state, grads,
                                       jnp.float32(1.0 / max(1, n_accum)))

    def train_step_accum(self, state: TrainState, batches: List[Batch],
                         n_accum: int = 0) -> Tuple[TrainState, jax.Array]:
        """One optimizer step from several micro-batches.

        ``n_accum`` is the divisor applied to the summed gradients: the
        number of REAL batches accumulated (Lightning parity — each batch
        contributes its mean). ragged_split sub-batches of one batch are
        partitions of a single sum-reduced loss, so they sum WITHOUT
        scaling (n_accum=1); callers mixing both pass the real-batch
        count. 0 (default) = len(batches), the plain accumulation case."""
        acc = None
        losses = []
        for b in batches:
            grads, stats, loss = self.grad_step(state, b)
            state = state.replace(batch_stats=stats)
            acc = grads if acc is None else jax.tree_util.tree_map(
                jnp.add, acc, grads)
            losses.append(loss)
        state = self.apply_grads(state, acc, n_accum or len(batches))
        return state, losses[-1]

    def train_step(self, state: TrainState, batch: Batch,
                   staged=None) -> Tuple[TrainState, jax.Array]:
        """One optimizer step. ``staged`` short-circuits put_batch with
        device arrays a DevicePrefetcher already transferred."""
        args = staged if staged is not None else self.put_batch(batch)
        key = (args[0].shape, args[2].shape)
        if key not in self._compiled:
            sh = self.state_shardings(state)
            bsh = batch_sharding(self.mesh)
            self._compiled[key] = jax.jit(
                self._train_step_fn(),
                in_shardings=(sh, bsh, bsh, bsh, bsh, bsh),
                out_shardings=(sh, NamedSharding(self.mesh, P())),
                donate_argnums=(0,) if self.cfg.trainer.donate_state else (),
            )
        return self._compiled[key](state, *args)

    def put_batch(self, batch: Batch):
        """Host batch -> global device arrays sharded P('data').

        Multi-process: every host holds only its shard; shapes are agreed
        across hosts and the global array is assembled shard-wise
        (dsjax.parallel.multihost) — a host never touches non-addressable
        devices. Single-process: plain device_put.
        """
        from dsjax.parallel.multihost import agree_shapes, make_global

        bsh = batch_sharding(self.mesh)
        x = batch.inputs if batch.inputs is not None else batch.audio
        arrays = agree_shapes((
            x, batch.input_lengths.astype(np.int32),
            batch.targets.astype(np.int32),
            batch.target_lengths.astype(np.int32),
            batch.valid_mask))
        return tuple(make_global(bsh, a) for a in arrays)

    def eval_step(self, state: TrainState, batch: Batch):
        from dsjax.parallel.multihost import agree_shapes, make_global

        bsh = batch_sharding(self.mesh)
        x = batch.inputs if batch.inputs is not None else batch.audio
        inputs, lens = (make_global(bsh, a) for a in agree_shapes(
            (x, batch.input_lengths.astype(np.int32))))
        key = inputs.shape
        if key not in self._eval_compiled:
            sh = self.state_shardings(state)
            model = self.model

            def fn(st: TrainState, inputs, input_lengths):
                feats = self._features(inputs, input_lengths)
                out, out_lens, _ = model.apply(
                    {"params": st.params, "batch_stats": st.batch_stats},
                    feats, input_lengths, train=False)
                return out, out_lens

            self._eval_compiled[key] = jax.jit(
                fn, in_shardings=(sh, bsh, bsh),
                out_shardings=(bsh, bsh))
        return self._eval_compiled[key](state, inputs, lens)

    # ------------------------------------------------------------------
    # epoch loops
    # ------------------------------------------------------------------

    def validate(self, state: TrainState, pipeline: Iterable[Batch],
                 max_batches: Optional[int] = None, verbose: bool = False
                 ) -> Tuple[float, float]:
        from dsjax.parallel.multihost import host_local_rows

        wer, cer = WordErrorRate(), CharErrorRate()
        multiproc = jax.process_count() > 1
        for i, batch in enumerate(pipeline):
            if max_batches is not None and i >= max_batches:
                break
            out, out_lens = self.eval_step(state, batch)
            # multi-process: fetch/decode only this host's addressable row
            # block (fetching the full P('data') array would touch
            # non-addressable devices and raise); the cross-host integer
            # sum below combines per-host counts.
            if multiproc:
                out = host_local_rows(out)
                out_lens = host_local_rows(out_lens)
            n_real = int(batch.valid_mask.sum()) or batch.size
            decoded, _ = self.decoder.decode(np.asarray(out), np.asarray(out_lens),
                                              n_best=1)
            refs = self.decoder.convert_to_strings(
                [batch.targets[b, :batch.target_lengths[b]] for b in range(batch.size)])
            transcripts = [d[0] for d in decoded[:n_real]]
            references = [r[0] for r in refs[:n_real]]
            update_batch(wer, cer, transcripts, references)
            if verbose:
                for t, r in zip(transcripts, references):
                    print(f"Ref:  {r}\nHyp:  {t}\n")
        # exact integer sum-reduction across hosts (torchmetrics
        # dist_reduce_fx="sum" parity, reference validation.py:63-64)
        if jax.process_count() > 1:
            from jax.experimental import multihost_utils

            sums = multihost_utils.process_allgather(
                jnp.asarray([wer.distance, wer.denom, cer.distance, cer.denom],
                            jnp.int32))
            tot = np.asarray(sums).sum(axis=0)
            wer.distance, wer.denom = int(tot[0]), int(tot[1])
            cer.distance, cer.denom = int(tot[2]), int(tot[3])
        return wer.compute(), cer.compute()

    def fit(self, train_pipeline, val_pipeline, checkpoint_handler=None,
            state: Optional[TrainState] = None,
            log_fn: Callable[[str], None] = print,
            metrics_logger=None) -> TrainState:
        from dsjax.train.logging import StepTimer

        cfg = self.cfg
        state = state if state is not None else self.init_state()
        start_epoch = int(np.asarray(state.epoch))
        n_val = _limit(len(val_pipeline), cfg.trainer.limit_val_batches)
        timer = StepTimer()
        for epoch in range(start_epoch, cfg.trainer.max_epochs):
            train_pipeline.sampler.set_epoch(epoch)
            # recompute per epoch: after a mid-epoch auto-resume the first
            # epoch is shorter (sampler.start_index > 0) but later epochs,
            # whose start_index resets to 0, must run full length
            n_train = _limit(len(train_pipeline), cfg.trainer.limit_train_batches)
            state = state.replace(epoch=jnp.asarray(epoch, jnp.int32))
            state = self.shard_state(state)
            t0 = time.time()
            losses = []
            timer.start()
            accum = max(1, cfg.trainer.accumulate_grad_batches)
            micro: List[Batch] = []
            micro_batches = 0
            # stage uploads ahead of the step (single-process only: the
            # multi-process put_batch collective must stay on this thread)
            dp_depth = int(getattr(cfg.data, "device_prefetch", 0))
            use_dp = (dp_depth > 0 and accum == 1
                      and jax.process_count() == 1)
            if use_dp:
                import itertools

                from dsjax.data.loader import DevicePrefetcher

                # bound the SOURCE so the producer never stages (uploads)
                # batches past the n_train limit
                train_iter = DevicePrefetcher(
                    itertools.islice(iter(train_pipeline), n_train),
                    self.put_batch, depth=dp_depth)
            else:
                train_iter = train_pipeline
            for i, item in enumerate(train_iter):
                batch, staged = item if use_dp else (item, None)
                if i >= n_train:
                    break
                global_step = int(np.asarray(state.step)) if cfg.trainer.profile else -1
                if cfg.trainer.profile and global_step == cfg.trainer.profile_start_step:
                    jax.profiler.start_trace(cfg.trainer.profile_dir)
                # ragged_split pipelines yield each batch as a list of
                # length-quantile sub-batches -> one summed-grad step
                subs = batch if isinstance(batch, list) else [batch]
                if accum > 1:
                    micro.extend(subs)
                    micro_batches += 1
                    if micro_batches < accum and i + 1 < n_train:
                        continue
                    # scale by REAL batches accumulated, not sub-batches:
                    # ragged_split partitions one sum-reduced loss
                    state, loss = self.train_step_accum(state, micro,
                                                        n_accum=micro_batches)
                    micro = []
                    micro_batches = 0
                elif len(subs) > 1:
                    state, loss = self.train_step_accum(state, subs, n_accum=1)
                else:
                    state, loss = self.train_step(state, batch, staged=staged)
                if (cfg.trainer.profile and global_step
                        == cfg.trainer.profile_start_step + cfg.trainer.profile_num_steps):
                    jax.block_until_ready(loss)
                    jax.profiler.stop_trace()
                losses.append(loss)
                # mid-epoch validation (Lightning val_check_interval parity)
                vci = cfg.trainer.val_check_interval
                if 0 < vci < 1.0:
                    every_val = max(1, int(n_train * vci))
                    if (i + 1) % every_val == 0 and (i + 1) < n_train:
                        wer_i, cer_i = self.validate(state, val_pipeline,
                                                     max_batches=n_val)
                        log_fn(f"epoch {epoch} step {i + 1}: "
                               f"wer {wer_i:.2f} cer {cer_i:.2f}")
                        if metrics_logger is not None:
                            metrics_logger.log(int(np.asarray(state.step)),
                                               wer=wer_i, cer=cer_i, epoch=epoch)
                # mid-epoch checkpointing with sampler position, enabling
                # mid-epoch elastic resume (reference: samplers' start_index)
                every = cfg.checkpoint.every_n_steps
                if (checkpoint_handler is not None and every > 0
                        and (i + 1) % every == 0 and (i + 1) < n_train):
                    checkpoint_handler.save(
                        state, {"loss": float(loss)},
                        extra={"start_index": train_pipeline.sampler.start_index + i + 1,
                               "epoch": epoch},
                        last_only=True)
                if (i + 1) % max(1, cfg.trainer.log_every_n_steps) == 0:
                    loss_val = float(loss)  # device sync only when logging
                    timer.tick(sum(b.size for b in subs)
                               * max(1, cfg.trainer.log_every_n_steps))
                    log_fn(f"epoch {epoch} step {i + 1}/{n_train} "
                           f"loss {loss_val:.3f} "
                           f"({timer.utterances_per_sec:.1f} utt/s)")
                    if metrics_logger is not None:
                        metrics_logger.log(int(np.asarray(state.step)),
                                           loss=loss_val,
                                           utt_per_sec=timer.utterances_per_sec,
                                           epoch=epoch)
            train_time = time.time() - t0
            mean_loss = float(np.mean([float(l) for l in losses])) if losses else 0.0
            wer, cer = self.validate(state, val_pipeline, max_batches=n_val)
            log_fn(f"epoch {epoch}: loss {mean_loss:.3f} "
                   f"wer {wer:.2f} cer {cer:.2f} ({train_time:.1f}s)")
            if metrics_logger is not None:
                metrics_logger.log(int(np.asarray(state.step)), wer=wer, cer=cer,
                                   mean_loss=mean_loss, epoch=epoch)
            if checkpoint_handler is not None and cfg.trainer.enable_checkpointing:
                # save with epoch+1 so auto-resume continues at the NEXT
                # epoch; re-shard so the fresh epoch scalar is a GLOBAL
                # (replicated) array — orbax refuses host-local arrays in
                # multi-host saves
                ck_state = self.shard_state(
                    state.replace(epoch=jnp.asarray(epoch + 1, jnp.int32)))
                checkpoint_handler.save(
                    ck_state,
                    {"wer": wer, "cer": cer, "loss": mean_loss, "epoch": epoch})
            # sampler start_index reset after completing an epoch
            train_pipeline.sampler.start_index = 0
        return state
