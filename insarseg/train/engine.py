"""Jitted training/eval engine (L5) — the reference's epoch loop, TPU-native.

The reference train loop (/root/reference/Unet.py:243-322) is: Adam(1e-4),
CE(ignore_index=255), per-step host-side metrics, epoch validation, and
best-val-mIoU ``torch.save``. Here the *whole step* (forward, loss, backward,
Adam update, BatchNorm running-stat update, confusion counts) is one
XLA-compiled ``train_step(state, batch)``; the host only sees scalar counts.
Metrics follow the reference's batch-size-weighted averaging
(``Config.metrics_mode='batch_mean'``) or the corrected global-confusion
mode. Checkpointing goes through Orbax (``insarseg.train.checkpoint``) —
best-by-val-mIoU params *and* latest-with-optimizer-state for resume, which
the reference lacks (save-only, no ``load_state_dict`` anywhere —
SURVEY.md §5).

Multi-chip: pass ``mesh``/shardings from ``insarseg.parallel`` — the step is
written mesh-agnostic (no pmaps, no axis names); GSPMD handles gradient
all-reduce and sync-BN from the batch sharding alone.
"""

from __future__ import annotations

import time
from typing import Any, Callable, Dict, List, Optional

import jax
import jax.numpy as jnp
import optax
from flax import struct

from insarseg.data.augment import normalize_u8, random_dihedral
from insarseg.train import metrics as M
from insarseg.train.losses import cross_entropy_loss


class TrainState(struct.PyTreeNode):
    step: jnp.ndarray
    params: Any
    batch_stats: Any
    opt_state: Any
    tx: optax.GradientTransformation = struct.field(pytree_node=False)

    def apply_gradients(self, grads, new_batch_stats):
        updates, new_opt_state = self.tx.update(grads, self.opt_state, self.params)
        return self.replace(
            step=self.step + 1,
            params=optax.apply_updates(self.params, updates),
            batch_stats=new_batch_stats,
            opt_state=new_opt_state,
        )


def create_state(
    model,
    rng: jax.Array,
    sample_input: jnp.ndarray,
    learning_rate: float = 1e-4,
    tx: Optional[optax.GradientTransformation] = None,
) -> TrainState:
    """Initialize params/batch_stats and Adam (torch defaults: b1=.9, b2=.999,
    eps=1e-8 — matching optim.Adam at /root/reference/Unet.py:369)."""
    init_rng, drop_rng = jax.random.split(rng)
    variables = model.init({"params": init_rng, "dropout": drop_rng}, sample_input)
    tx = tx or optax.adam(learning_rate, b1=0.9, b2=0.999, eps=1e-8)
    params = variables["params"]
    return TrainState(
        step=jnp.zeros((), jnp.int32),
        params=params,
        batch_stats=variables.get("batch_stats", {}),
        opt_state=tx.init(params),
        tx=tx,
    )


def _to_float(image, normalize: Optional[tuple]):
    """On-device uint8 -> normalized float (raw-u8 loaders ship bytes);
    ``normalize=None`` means ToTensor semantics only (scale to [0, 1])."""
    if image.dtype != jnp.uint8:
        return image
    if normalize is None:
        return image.astype(jnp.float32) / 255.0
    return normalize_u8(image, *normalize)


def make_train_step(
    model, num_classes: int, ignore_index: int = 255,
    augment: bool = False, normalize: Optional[tuple] = (0.5, 0.5),
) -> Callable:
    """Build the jitted train step: (state, image, mask, rng) ->
    (state, {loss, counts...}).

    ``rng`` is a BASE key: the step folds ``state.step`` into it on-device,
    so the caller passes the SAME key every step — no per-step host-side
    ``split`` (one fewer ~30 ms dispatch per step on the axon tunnel), and a
    resumed run (restored ``state.step``) continues the exact augmentation/
    dropout stream of the crashed one.

    ``augment`` applies a random on-device D4 transform per sample. uint8
    images are normalized on-device with ``normalize=(mean, std)`` — ship
    raw bytes from the host, 4x less transfer.
    """

    def step(state: TrainState, image, mask, rng):
        rng = jax.random.fold_in(rng, state.step)
        image = _to_float(image, normalize)
        if augment:
            rng, aug_rng = jax.random.split(rng)
            image, mask = random_dihedral(aug_rng, image, mask)

        def loss_fn(params):
            out = model.apply(
                {"params": params, "batch_stats": state.batch_stats},
                image,
                train=True,
                mutable=["batch_stats"],
                rngs={"dropout": rng},
            )
            logits, mutated = out
            # Materialize logits in their natural (B,H,W,C) layout before
            # the loss. Without this, XLA's simplifier propagates the fast
            # cell's depth-to-space reshape INTO the CE/one-hot ops,
            # emitting 6-D [B,H/2,W/2,2,2,C] tensors on T(2,128) tiling —
            # 6.3 of a 7.4 ms loss tail, 10% of that cell's train step
            # (BASELINE.md "Round 5: train-step speed of light"). The
            # barrier is an identity (bit-exact, grads pass through).
            # Measured 512^2 bf16: fast b16 216->236.9 t/s (+9.6%), fast
            # b32 233.4->245.9 (+5.3%); neutral on the exact cell (its
            # loss tail is 4.0 of 215.7 ms).
            logits = jax.lax.optimization_barrier(logits)
            loss = cross_entropy_loss(logits, mask, ignore_index)
            return loss, (logits, mutated["batch_stats"])

        (loss, (logits, new_stats)), grads = jax.value_and_grad(
            loss_fn, has_aux=True
        )(state.params)
        new_state = state.apply_gradients(grads, new_stats)
        counts = M.confusion_counts(logits, mask, num_classes, ignore_index)
        return new_state, {"loss": loss, **counts}

    return jax.jit(step, donate_argnums=(0,))


def make_eval_step(model, num_classes: int, ignore_index: int = 255,
                   normalize: Optional[tuple] = (0.5, 0.5)) -> Callable:
    def step(params, batch_stats, image, mask):
        image = _to_float(image, normalize)
        logits = model.apply(
            {"params": params, "batch_stats": batch_stats}, image, train=False
        )
        # Same loss-boundary layout pin as the train step (see loss_fn).
        logits = jax.lax.optimization_barrier(logits)
        loss = cross_entropy_loss(logits, mask, ignore_index)
        counts = M.confusion_counts(logits, mask, num_classes, ignore_index)
        return {"loss": loss, **counts}

    return jax.jit(step)


def make_engine_eval_step(predict: Callable, num_classes: int,
                          ignore_index: int = 255,
                          normalize: Optional[tuple] = (0.5, 0.5)) -> Callable:
    """Eval step over a serving-engine ``predict(images) -> logits``
    (insarseg/engines.py) instead of the module graph — same loss/metric
    contract as :func:`make_eval_step`, so ``evaluate`` and the CLI can
    score the serve/int8 engines against real data (int8 calibration QA)."""

    def step(params, batch_stats, image, mask):
        del params, batch_stats  # baked into the packed engine
        image = _to_float(image, normalize)
        logits = predict(image).astype(jnp.float32)
        # Same loss-boundary layout pin as the train step (see loss_fn).
        logits = jax.lax.optimization_barrier(logits)
        loss = cross_entropy_loss(logits, mask, ignore_index)
        counts = M.confusion_counts(logits, mask, num_classes, ignore_index)
        return {"loss": loss, **counts}

    return jax.jit(step)


class _Averager:
    """Reference-parity metric averaging: per-batch metrics weighted by real
    batch size (SURVEY.md §2.2.20); or global-confusion accumulation.

    Host-sync free during the epoch: ``update`` only *stores* the step's tiny
    device count vectors (the reference round-trips logits to CPU every step,
    /root/reference/Unet.py:274; a per-step ``float()`` here would reintroduce
    that on the ~30 ms-dispatch axon tunnel). Everything is reduced in one
    vectorized pass at ``result``, once per epoch."""

    def __init__(self, version: int, mode: str):
        self.version = version
        self.mode = mode
        self._outs: List[Dict[str, jnp.ndarray]] = []
        self._weights: List[int] = []

    _KEYS = ("loss", "tp", "fp", "fn", "correct", "valid")

    def update(self, out: Dict[str, jnp.ndarray], n_valid: int):
        self._outs.append({k: out[k] for k in self._KEYS})
        self._weights.append(int(n_valid))

    def result(self, prefix: str) -> Dict[str, float]:
        n = max(sum(self._weights), 1)
        if not self._outs:
            return {f"{prefix}_loss": 0.0}
        stacked = jax.tree.map(lambda *xs: jnp.stack(xs), *self._outs)
        w = jnp.asarray(self._weights, jnp.float32)
        counts = {k: stacked[k] for k in ("tp", "fp", "fn", "correct", "valid")}
        res = {f"{prefix}_loss": float(jnp.sum(stacked["loss"] * w)) / n}
        if self.mode == "batch_mean":
            # per-batch metrics (vmap over the step axis), batch-size weighted
            m = jax.vmap(lambda c: M.compute(c, self.version))(counts)
            for k, v in m.items():
                res[f"{prefix}_{k}"] = float(jnp.sum(v * w)) / n
        else:
            m = M.compute(jax.tree.map(lambda a: jnp.sum(a, 0), counts),
                          self.version)
            for k, v in m.items():
                res[f"{prefix}_{k}"] = float(v)
        return res


def evaluate(
    eval_step, params, batch_stats, loader, version: int = 2,
    mode: str = "batch_mean", prefix: str = "val", verbose: bool = True,
    place=None,
) -> Dict[str, float]:
    avg = _Averager(version, mode)
    for batch in loader:
        if place is not None:
            batch = place(batch)
        out = eval_step(params, batch_stats, batch["image"], batch["mask"])
        avg.update(out, batch["n_valid"])
    res = avg.result(prefix)
    if verbose:
        keys = ", ".join(f"{k}={v:.4f}" for k, v in res.items())
        print(f"--- validation: {keys} ---")
    return res


def fit(
    model,
    cfg,
    train_loader,
    val_loader=None,
    rng: Optional[jax.Array] = None,
    state: Optional[TrainState] = None,
    checkpointer=None,
    verbose: bool = True,
    resume: bool = False,
) -> List[Dict[str, Any]]:
    """Full training run. Returns the history list with the reference's JSON
    key contract: epoch, train_loss/acc/miou(/mpa/mf1), val_* (SURVEY.md §5).

    ``resume=True`` restores the latest full TrainState (params, optimizer,
    BN stats, step) from ``checkpointer`` when one exists and continues the
    epoch count from where the crashed run stopped — the reference can't do
    this (save-only, no ``load_state_dict`` anywhere, SURVEY.md §5). The
    returned history covers only the resumed epochs; callers merge with the
    previously-saved history file.

    Multi-chip: when more than one device is visible (or Config.mesh_* is
    set), the batch is sharded over a ('data', 'spatial') ICI mesh and the
    state replicated — gradients all-reduce and BatchNorm synchronizes via
    GSPMD with no further changes (SURVEY.md §2.4).
    """
    rng = jax.random.key(cfg.seed) if rng is None else rng
    # shape-probe peek: loaders must be RE-ITERABLE (each epoch calls
    # iter() afresh); close the probe iterator so prefetch threads exit
    peek = iter(train_loader)
    first = next(peek)
    if hasattr(peek, "close"):
        peek.close()

    mesh = None
    if len(jax.devices()) > 1 or cfg.mesh_spatial > 1 or cfg.mesh_data > 1:
        from insarseg.parallel import make_mesh, replicate, shard_batch

        if cfg.mesh_spatial > len(jax.devices()):
            raise ValueError(
                f"mesh_spatial={cfg.mesh_spatial} exceeds the "
                f"{len(jax.devices())} visible devices")
        batch_size = first["image"].shape[0]
        want = cfg.mesh_data
        if want <= 0:
            want = len(jax.devices()) // cfg.mesh_spatial
        # the data axis must divide the global batch
        data = max(d for d in range(1, want + 1) if batch_size % d == 0)
        mesh = make_mesh(data, cfg.mesh_spatial)
        place = lambda batch: shard_batch(batch, mesh)
    else:
        place = lambda batch: {
            **batch,
            "image": jnp.asarray(batch["image"]),
            "mask": jnp.asarray(batch["mask"]),
        }

    if state is None:
        rng, init_rng = jax.random.split(rng)
        sample = jnp.asarray(first["image"])
        if sample.dtype == jnp.uint8:
            # raw-u8 loaders ship uint8; init must see the float the jitted
            # step will produce (normalize_u8 runs inside make_train_step)
            sample = normalize_u8(sample, cfg.normalize_mean, cfg.normalize_std)
        state = create_state(model, init_rng, sample, cfg.learning_rate)
    start_epoch = 0
    best_miou = -1.0
    if resume and checkpointer is not None and checkpointer.has_latest():
        # restore BEFORE mesh replication: restored arrays are unsharded
        state = checkpointer.restore_latest(state)
        steps_per_epoch = max(len(train_loader), 1)
        start_epoch = min(int(state.step) // steps_per_epoch, cfg.num_epochs)
        best_miou = checkpointer.best_metric()
        if verbose:
            print(f"resumed from step {int(state.step)} "
                  f"(epoch {start_epoch}, best val mIoU {best_miou:.4f})")
    if mesh is not None:
        state = state.replace(
            step=replicate(state.step, mesh),
            params=replicate(state.params, mesh),
            batch_stats=replicate(state.batch_stats, mesh),
            opt_state=replicate(state.opt_state, mesh),
        )
    norm = (cfg.normalize_mean, cfg.normalize_std)
    train_step = make_train_step(
        model, cfg.num_classes, cfg.ignore_index,
        augment=getattr(cfg, "augment", False), normalize=norm,
    )
    eval_step = make_eval_step(model, cfg.num_classes, cfg.ignore_index,
                               normalize=norm)

    history: List[Dict[str, Any]] = []
    t_start = time.time()

    for epoch in range(start_epoch, cfg.num_epochs):
        if hasattr(train_loader, "set_epoch"):
            # deterministic shuffle order = f(seed, epoch): resumed runs see
            # the same batches the crashed run would have
            train_loader.set_epoch(epoch)
        avg = _Averager(cfg.metrics_version, cfg.metrics_mode)
        for i, batch in enumerate(train_loader):
            placed = place(batch)
            # rng is the BASE key: the jitted step folds state.step into it
            # on-device (no per-step host dispatch; resume-continuous stream)
            state, out = train_step(
                state, placed["image"], placed["mask"], rng
            )
            avg.update(out, batch["n_valid"])
            if verbose and (i + 1) % cfg.log_every_steps == 0:
                # reference step log: loss + acc + miou every N steps
                # (/root/reference/Unet.py:278-279)
                sm = M.compute(
                    {k: out[k] for k in ("tp", "fp", "fn", "correct", "valid")},
                    cfg.metrics_version,
                )
                print(
                    f"epoch [{epoch + 1}/{cfg.num_epochs}] step [{i + 1}] "
                    f"loss {float(out['loss']):.4f} "
                    f"acc {float(sm['acc']):.4f} miou {float(sm['miou']):.4f}"
                )
        epoch_metrics = {"epoch": epoch + 1, **avg.result("train")}
        if verbose:
            keys = ", ".join(
                f"{k}={v:.4f}" for k, v in epoch_metrics.items() if k != "epoch"
            )
            print(f"=== epoch {epoch + 1}/{cfg.num_epochs}: {keys} ===")

        if val_loader is not None:
            val_metrics = evaluate(
                eval_step, state.params, state.batch_stats, val_loader,
                cfg.metrics_version, cfg.metrics_mode, verbose=verbose,
                place=place,
            )
            epoch_metrics.update(val_metrics)
            cur = val_metrics.get("val_miou", 0.0)
            if cur > best_miou:
                best_miou = cur
                if checkpointer is not None:
                    checkpointer.save_best(state, best_miou)
                if verbose:
                    print(f"*** val mIoU improved to {best_miou:.4f} ***")
        if checkpointer is not None:
            checkpointer.save_latest(state)
        history.append(epoch_metrics)

    if verbose:
        print(f"training done in {(time.time() - t_start) / 60:.2f} min")
    return history
