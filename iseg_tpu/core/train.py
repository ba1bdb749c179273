"""Training driver: TrainState + one jitted train step + host epoch loop.

Parity with the reference's ``core_train.py:22`` ``CoreTrain`` (dataset
prep :155-195, resume-epoch :107-116, callbacks :121-152) — minus Keras:
the step is a single ``jax.jit``-compiled function over the device mesh;
gradients, SyncBN moments and metric reductions ride GSPMD-inserted ICI
collectives. The host loop owns checkpoint/log cadence.
"""

from __future__ import annotations

import time
from typing import Any, Callable, Iterable, Optional

import flax
import jax
import jax.numpy as jnp
import optax

from iseg_tpu.parallel.mesh import MeshEnv, shard_batch

# "no handler was installed" marker for SIGTERM save/restore — distinct
# from None, which signal.signal() returns for non-Python handlers
_UNSET_HANDLER = object()


class TrainState(flax.struct.PyTreeNode):
    """Carries params + BN batch_stats + optimizer state.

    Equivalent of the reference's compiled-Keras-model + optimizer bundle
    (``utils/model_utils.py:20`` ``create_compiled_model``)."""

    step: jax.Array
    params: Any
    batch_stats: Any
    opt_state: Any
    apply_fn: Callable = flax.struct.field(pytree_node=False)
    tx: optax.GradientTransformation = flax.struct.field(pytree_node=False)
    # optional exponential moving average of params (beyond-reference
    # production feature): tracked inside the jitted step, used for eval
    # via ``eval_variables()``. None when disabled.
    ema_params: Any = None
    ema_decay: Optional[float] = flax.struct.field(
        pytree_node=False, default=None)

    def apply_gradients(self, grads, new_batch_stats=None):
        updates, new_opt_state = self.tx.update(grads, self.opt_state, self.params)
        new_params = optax.apply_updates(self.params, updates)
        new_ema = self.ema_params
        if self.ema_params is not None:
            d = jnp.asarray(self.ema_decay, jnp.float32)
            new_ema = jax.tree_util.tree_map(
                lambda e, p: (e * d + (1.0 - d) * p.astype(e.dtype)).astype(
                    e.dtype),
                self.ema_params, new_params,
            )
            # under gradient accumulation (optax.MultiSteps via
            # with_grad_accum) only every k-th micro-step applies a real
            # update; the EMA must decay once per REAL update, not per
            # micro-step (decay^k would shrink a 1000-step horizon to
            # 1000/k). MultiSteps resets mini_step to 0 exactly when the
            # inner transform fired.
            mini_step = getattr(new_opt_state, "mini_step", None)
            if mini_step is not None:
                applied = mini_step == 0
                new_ema = jax.tree_util.tree_map(
                    lambda n, e: jnp.where(applied, n, e),
                    new_ema, self.ema_params,
                )
        return self.replace(
            step=self.step + 1,
            params=new_params,
            opt_state=new_opt_state,
            batch_stats=(
                new_batch_stats if new_batch_stats is not None else self.batch_stats
            ),
            ema_params=new_ema,
        )

    def eval_variables(self) -> dict:
        """Variables dict for evaluation/prediction: EMA params when
        tracked, else the raw params, plus BN running stats."""
        params = self.ema_params if self.ema_params is not None else self.params
        return {"params": params, "batch_stats": self.batch_stats}


def create_train_state(
    model,
    rng: jax.Array,
    input_shape: tuple[int, ...],
    tx: optax.GradientTransformation,
    input_dtype=jnp.float32,
    ema_decay: Optional[float] = None,
    variables=None,
) -> TrainState:
    """Init variables with a dummy forward pass (the reference builds
    backbones the same way, ``backbones/feature_extractor.py:153-164``).

    ``ema_decay`` (e.g. 0.999) enables a params EMA updated every
    optimizer step, initialized to the initial params. Pass ``variables``
    when the model is already initialized (e.g. pretrained ingest, or the
    driver needed params for the optimizer) — re-running init would add a
    second multi-second trace+compile to startup."""
    if variables is None:
        dummy = jnp.zeros(input_shape, input_dtype)
        variables = model.init({"params": rng, "dropout": rng}, dummy,
                               train=False)
    params = variables["params"]
    batch_stats = variables.get("batch_stats", flax.core.freeze({}))
    return TrainState(
        step=jnp.zeros((), jnp.int32),
        params=params,
        batch_stats=batch_stats,
        opt_state=tx.init(params),
        apply_fn=model.apply,
        tx=tx,
        ema_params=(jax.tree_util.tree_map(jnp.asarray, params)
                    if ema_decay is not None else None),
        ema_decay=ema_decay,
    )


def _train_step_body(loss_fn: Callable) -> Callable:
    """The un-jitted train-step function, shared by :func:`make_train_step`
    (one program per batch) and :func:`make_resident_train_step` (gather +
    augment fused into the same program)."""

    def train_step(state: TrainState, batch: dict, rng: jax.Array):
        step_rng = jax.random.fold_in(rng, state.step)

        def compute_loss(params):
            variables = {"params": params, "batch_stats": state.batch_stats}
            outputs, mutated = state.apply_fn(
                variables,
                batch["image"],
                train=True,
                mutable=["batch_stats"],
                rngs={"dropout": step_rng},
            )
            loss, parts = loss_fn(outputs, batch["label"])
            return loss, (mutated.get("batch_stats", state.batch_stats), parts)

        grad_fn = jax.value_and_grad(compute_loss, has_aux=True)
        (loss, (new_batch_stats, parts)), grads = grad_fn(state.params)
        new_state = state.apply_gradients(grads, new_batch_stats=new_batch_stats)
        return new_state, parts

    return train_step


def make_train_step(loss_fn: Callable, donate: bool = True) -> Callable:
    """Build the jitted train step.

    ``loss_fn(outputs, labels) -> (total, parts_dict)`` — typically
    ``model.build_loss_fn()`` (reference ``core_model.py:471``).
    """
    return jax.jit(_train_step_body(loss_fn),
                   donate_argnums=(0,) if donate else ())


# device_augment RNG stream tag — must match CoreTrain's host-side
# derivation (fold_in(fold_in(rng, _AUGMENT_STREAM), step)) so the fused
# resident step draws the exact same augmentation keys as the
# separate-dispatch path (results then agree up to XLA fusion rounding)
_AUGMENT_STREAM = 0x0AB6


def make_resident_train_step(
    loss_fn: Callable,
    images: jax.Array,
    labels: jax.Array,
    augment_fn: Optional[Callable] = None,
    donate: bool = True,
    mesh=None,
) -> Callable:
    """ONE compiled program per training step for device-resident data
    (``iseg_tpu.data.resident.DeviceResidentDataset``): on-device gather
    from the resident ``images``/``labels`` + fused augmentation + the
    full fwd/bwd/update, dispatched as a single executable.

    The host ships only a ``[batch]`` int32 index vector per step. The
    separate-dispatch path (gather program, augment program, train
    program, plus the eager ``fold_in`` key derivations) pays one runtime
    RPC per dispatch — measured ~3 ms/step of the disk-fed gap on a
    tunnel-attached host (BENCH_NOTES round 3); a pod host pays dispatch
    jitter instead. Fusing removes all but one dispatch and lets XLA fuse
    the augment chain into the step's input processing.

    ``augment_fn(key, images_u8, labels_i32) -> (image, label)`` — e.g.
    ``make_device_augment(cfg)`` composed with input normalization; the
    key reproduces CoreTrain's stream-tagged derivation at ``state.step``.
    Returns ``step(state, idx, rng) -> (new_state, parts)``.

    With ``mesh``, the gathered batch is constrained onto the data axis so
    augment + fwd/bwd run data-parallel. Pairs with
    ``DeviceResidentDataset(mesh=...)`` (dataset sample-sharded across chip
    HBM): GSPMD assembles each device's batch slice from the owning chips
    — one uint8-batch all-reduce of ICI traffic per step, never the
    dataset (see data/resident.py module doc).
    """
    body = _train_step_body(loss_fn)
    if mesh is not None:
        from iseg_tpu.parallel.mesh import batch_sharding, replicated_sharding

        idx_sharding = replicated_sharding(mesh)

    def fused(state: TrainState, res_images, res_labels, idx, rng):
        image = jnp.take(res_images, idx, axis=0)
        label = jnp.take(res_labels, idx, axis=0).astype(jnp.int32)
        if mesh is not None:
            image = jax.lax.with_sharding_constraint(
                image, batch_sharding(mesh, image.ndim))
            label = jax.lax.with_sharding_constraint(
                label, batch_sharding(mesh, label.ndim))
        if augment_fn is not None:
            aug_rng = jax.random.fold_in(
                jax.random.fold_in(rng, _AUGMENT_STREAM), state.step)
            image, label = augment_fn(aug_rng, image, label)
        else:
            # no augment chain: hand the model raw 0-255 floats (the
            # uint8 storage dtype is a shard-format detail, not an input
            # contract; normalization belongs to augment_fn)
            image = image.astype(jnp.float32)
        return body(state, {"image": image, "label": label}, rng)

    jitted = jax.jit(fused, donate_argnums=(0,) if donate else ())

    def step(state: TrainState, idx, rng: jax.Array):
        idx = jnp.asarray(idx, jnp.int32)
        if mesh is not None:
            idx = jax.device_put(idx, idx_sharding)
        return jitted(state, images, labels, idx, rng)

    return step


class CoreTrain:
    """Host training loop (reference ``core_train.py:74`` ``.train()``).

    ``dataset_fn(epoch) -> iterable of {"image": [N,H,W,C], "label": [N,H,W]}``
    host batches (global batch; sharded over the mesh's data axis here,
    mirroring the reference's ``AutoShardPolicy.DATA`` pod sharding).
    """

    def __init__(
        self,
        env: MeshEnv,
        model,
        tx: optax.GradientTransformation,
        loss_fn: Optional[Callable] = None,
        input_shape: tuple[int, ...] = (1, 512, 512, 3),
        seed: int = 0,
        checkpoint_manager=None,
        log_every: int = 50,
        callbacks: Optional[list] = None,
        inputs_process: Optional[Callable] = None,
        device_augment: Optional[Callable] = None,
        use_profiler: bool = False,
        profiler_dir: str = "/tmp/iseg_tpu_profile",
        profile_steps: int = 5,
        prefetch_to_device: int = 2,
        log_dir: Optional[str] = None,
        lr_schedule: Optional[Callable] = None,
        ema_decay: Optional[float] = None,
        handle_preemption: bool = True,
        grad_accum_every: int = 1,
        variables=None,
        resident_dataset=None,
    ):
        self.env = env
        self.model = model
        self.loss_fn = loss_fn or model.build_loss_fn()
        self.rng = jax.random.PRNGKey(seed)
        self.state = create_train_state(model, self.rng, input_shape, tx,
                                        ema_decay=ema_decay,
                                        variables=variables)
        # with with_grad_accum(tx, every=k), schedules inside tx advance
        # once per k micro-steps; used here so the LOGGED learning rate
        # indexes the schedule by real updates, not micro-steps
        self.grad_accum_every = max(1, int(grad_accum_every))
        # device-resident mode (data.resident.DeviceResidentDataset):
        # dataset_fn yields {"index": [B] int} batches and the gather +
        # device_augment + step run as ONE compiled program — see
        # make_resident_train_step. device_augment (if any) moves inside
        # the program; the loop's separate-dispatch branch is skipped.
        self.resident_dataset = resident_dataset
        # mesh constraints only when the dataset was uploaded sample-
        # sharded (DeviceResidentDataset(mesh=...)); an unsharded resident
        # dataset is committed to one device and trains there
        if resident_dataset is not None:
            self.train_step = make_resident_train_step(
                self.loss_fn, resident_dataset.images,
                resident_dataset.labels, augment_fn=device_augment,
                mesh=getattr(resident_dataset, "mesh", None))
        else:
            self.train_step = make_train_step(self.loss_fn)
        self.checkpoint_manager = checkpoint_manager
        self.log_every = log_every
        self.callbacks = list(callbacks or [])
        # per-model batch hook (reference ``core_train.py:198-205``)
        self.inputs_process = inputs_process
        # fused on-device augmentation (iseg_tpu.data.device_augment):
        # fn(rng, images, labels) -> (images, labels); runs jitted on the
        # sharded batch, feeding raw host images straight to the device
        self.device_augment = device_augment
        # jax.profiler trace window (reference core_train.py:121-126 wires
        # the TensorBoard profiler at 10% of the first epoch when
        # use_profiler=True; same policy here via utils.profiling)
        self.use_profiler = use_profiler
        self.profiler_dir = profiler_dir
        self.profile_steps = profile_steps
        # batches kept sharded ahead of the consumer so host->HBM DMA
        # overlaps the running step (reference: tf.data prefetch + infeed)
        self.prefetch_to_device = prefetch_to_device
        self._host_step = 0
        # durable scalar log: TensorBoard event file + CSV under log_dir
        # (reference wires the Keras TensorBoard callback,
        # core_train.py:121-126); scalars land at the log_every cadence,
        # epoch summaries at epoch end
        self.scalar_logger = None
        if log_dir is not None:
            from iseg_tpu.utils.summary import ScalarLogger

            self.scalar_logger = ScalarLogger(log_dir)
        # optional schedule fn (returned by get_optimizer) so the current
        # LR is logged alongside the losses
        self.lr_schedule = lr_schedule
        # graceful preemption (beyond-reference production feature; the
        # reference loses up to an epoch on pod preemption): SIGTERM sets
        # a flag, the step loop checkpoints durably at the next step
        # boundary and returns. Resume is exact-step: initial_epoch=-1
        # fast-forwards the (epoch-seeded, deterministic) dataset stream
        # past the already-applied batches, so no batch is applied twice.
        self.handle_preemption = handle_preemption
        self._preempt_requested = False

    def restore(self):
        """Resume from the latest checkpoint if one exists
        (reference ``modelhelper.py:113`` ``restore_checkpoint``)."""
        if self.checkpoint_manager is not None:
            restored = self.checkpoint_manager.restore_latest(self.state)
            if restored is not None:
                self.state = restored
                # continue the host-side rng/log counter from the restored
                # step so the device_augment stream resumes, not repeats
                self._host_step = int(self.state.step)
        return int(self.state.step)

    def train(
        self,
        dataset_fn: Callable[[int], Iterable[dict]],
        epochs: int = 1,
        steps_per_epoch: Optional[int] = None,
        initial_epoch: int = 0,
        on_epoch_end: Optional[Callable] = None,
    ):
        """Run the epoch loop (reference ``core_train.py:74-152``).

        ``initial_epoch=-1`` derives the resume epoch from the restored step
        count (reference ``core_train.py:107-116``); requires
        ``steps_per_epoch``."""
        resume_skip = 0
        if initial_epoch == -1:
            if not steps_per_epoch:
                raise ValueError("initial_epoch=-1 requires steps_per_epoch")
            initial_epoch = int(self.state.step) // steps_per_epoch
            # mid-epoch checkpoint (preemption save): skip the batches of
            # this epoch that were already applied — dataset_fn(epoch) is
            # epoch-seeded, so the skipped prefix is bit-identical to what
            # the preempted process consumed
            resume_skip = int(self.state.step) % steps_per_epoch

        import signal as _signal

        self._preempt_requested = False
        prev_handler = _UNSET_HANDLER
        if self.handle_preemption:
            def _on_preempt(signum, frame):
                self._preempt_requested = True
                print(
                    f"preemption signal {signum} received: checkpointing at "
                    "the next step boundary",
                    flush=True,
                )
            try:
                prev_handler = _signal.signal(_signal.SIGTERM, _on_preempt)
            except ValueError:
                pass  # not the main thread; flag-only mode

        try:
            history = self._train_loop(
                dataset_fn, epochs, steps_per_epoch, initial_epoch,
                resume_skip, on_epoch_end)
        finally:
            # None means the previous handler was installed by non-Python
            # code: signal.signal cannot re-install it (TypeError), and
            # leaving _on_preempt in place would swallow every later
            # SIGTERM into a stale flag — fall back to the default action
            # so the process terminates normally again
            if prev_handler is None:
                _signal.signal(_signal.SIGTERM, _signal.SIG_DFL)
            elif prev_handler is not _UNSET_HANDLER:
                _signal.signal(_signal.SIGTERM, prev_handler)
        return history

    def _preempt_checkpoint(self) -> None:
        """Durable mid-epoch save in response to a preemption notice."""
        step = int(self.state.step)
        if self.checkpoint_manager is not None:
            if step not in set(self.checkpoint_manager.all_steps()):
                self.checkpoint_manager.save(step, self.state)
            if hasattr(self.checkpoint_manager, "wait"):
                self.checkpoint_manager.wait()
        if self.scalar_logger is not None:
            self.scalar_logger.close()
            self.scalar_logger = None  # a closed writer must not be reused
        print(f"preempted: checkpoint durable at step={step}; exiting the "
              "train loop", flush=True)

    def _train_loop(
        self,
        dataset_fn,
        epochs,
        steps_per_epoch,
        initial_epoch,
        resume_skip,
        on_epoch_end,
    ):
        from iseg_tpu.utils.profiling import StepTimer

        # profiler window start step: 10% into the first profiled epoch
        # (reference core_train.py:121-126 profile_batch policy)
        profile_start = None
        if self.use_profiler:
            profile_start = max(1, (steps_per_epoch or 10) // 10)
        profiling = False
        profile_started_at = 0

        history = []
        for epoch in range(initial_epoch, epochs):
            for cb in self.callbacks:
                cb.on_epoch_begin(epoch, self.state)
            t0 = time.time()
            step_in_epoch = 0
            last_parts = {}
            timer = StepTimer()
            def process_and_shard(batch):
                if self.resident_dataset is not None:
                    return batch  # [B] index vector; data already on device
                if self.inputs_process is not None:
                    batch = self.inputs_process(batch)
                return shard_batch(self.env.mesh, batch)

            from iseg_tpu.data.loader import device_prefetch

            data = dataset_fn(epoch)
            if epoch == initial_epoch and resume_skip:
                # exact-step resume from a mid-epoch (preemption) save:
                # drop the already-applied prefix of this epoch's stream
                # on the host — never sharded, never stepped
                data = iter(data)
                for _ in range(resume_skip):
                    next(data, None)
                step_in_epoch = resume_skip

            batches = device_prefetch(
                data, process_and_shard,
                size=self.prefetch_to_device)
            for batch in batches:
                if (self.device_augment is not None
                        and self.resident_dataset is None):
                    # host-side counter: reading state.step would force a
                    # device sync every step
                    # stream-tagged so the augmentation keys never collide
                    # with the train step's fold_in(rng, state.step) dropout
                    # keys (same base, same counter = identical keys).
                    # _AUGMENT_STREAM keeps this derivation in lockstep with
                    # the fused resident step, which replays it at
                    # state.step inside the program.
                    aug_rng = jax.random.fold_in(
                        jax.random.fold_in(self.rng, _AUGMENT_STREAM),
                        self._host_step)
                    image, label = self.device_augment(
                        aug_rng, batch["image"], batch["label"]
                    )
                    batch = {"image": image, "label": label}
                if (profile_start is not None and epoch == initial_epoch
                        and step_in_epoch >= profile_start and not profiling):
                    # >= not ==: a mid-epoch (preemption) resume can enter
                    # the loop past profile_start; trace from wherever we
                    # actually are and size the window from there
                    jax.profiler.start_trace(self.profiler_dir)
                    profiling = True
                    profile_started_at = step_in_epoch
                if self.resident_dataset is not None:
                    self.state, parts = self.train_step(
                        self.state, batch["index"], self.rng)
                else:
                    self.state, parts = self.train_step(
                        self.state, batch, self.rng)
                self._host_step += 1
                last_parts = parts
                step_in_epoch += 1
                timer.tick()
                if self._preempt_requested:
                    if profiling:
                        jax.profiler.stop_trace()
                    self._preempt_checkpoint()
                    return history
                if profiling and step_in_epoch >= profile_started_at + self.profile_steps:
                    jax.tree_util.tree_map(
                        lambda x: x.block_until_ready(), parts)
                    jax.profiler.stop_trace()
                    profiling = False
                    profile_start = None
                    print(f"profiler trace written to {self.profiler_dir}",
                          flush=True)
                if self.log_every and step_in_epoch % self.log_every == 0:
                    loss = float(parts["loss"])
                    print(
                        f"epoch {epoch} step {step_in_epoch}: loss={loss:.4f}",
                        flush=True,
                    )
                    if self.scalar_logger is not None:
                        scalars = {
                            f"train/{k}": float(v) for k, v in parts.items()
                        }
                        if self.lr_schedule is not None:
                            scalars["train/learning_rate"] = float(
                                self.lr_schedule(
                                    self._host_step // self.grad_accum_every))
                        summ = timer.summary()
                        if "mean_s" in summ:
                            scalars["train/step_seconds"] = summ["mean_s"]
                        self.scalar_logger.log(scalars, self._host_step)
                if steps_per_epoch and step_in_epoch >= steps_per_epoch:
                    break
            if profiling:  # window spilled past the epoch: close it
                jax.profiler.stop_trace()
                profiling = False
                profile_start = None
            # epoch-end bookkeeping (reference TimeCallback + CheckpointSaver)
            dt = time.time() - t0
            record = {
                "epoch": epoch,
                "steps": step_in_epoch,
                "seconds": dt,
                **{f"step_{k}": v for k, v in timer.summary().items()
                   if k != "steps"},
                **{k: float(v) for k, v in last_parts.items()},
            }
            history.append(record)
            print(f"epoch {epoch} done in {dt:.1f}s: {record}", flush=True)
            if self.scalar_logger is not None:
                self.scalar_logger.log(
                    {f"epoch/{k}": float(v) for k, v in record.items()
                     if isinstance(v, (int, float))},
                    self._host_step,
                )
            if self.checkpoint_manager is not None:
                self.checkpoint_manager.save(int(self.state.step), self.state)
            if on_epoch_end is not None:
                on_epoch_end(epoch, self.state)
            for cb in self.callbacks:
                cb.on_epoch_end(epoch, self.state, record)
        for cb in self.callbacks:
            cb.on_train_end(self.state)
        if self.checkpoint_manager is not None and hasattr(
                self.checkpoint_manager, "wait"):
            # flush an in-flight async save before returning
            self.checkpoint_manager.wait()
        if self.scalar_logger is not None:
            self.scalar_logger.close()
            self.scalar_logger = None  # a closed writer must not be reused
        return history
