"""The training loop: one trainer for LLM and tokenizer stages.

Replaces three reference systems with one (SURVEY.md §7 design stance):
HF Trainer + DeepSpeed ZeRO (MultiModalLLM/src/train/trainer.py:41),
LAVIS RunnerBase/RunnerIter (SEED_Tokenizer/lavis/runners/), and the
hand-rolled AMP loop (lavis/tasks/base_task.py:155-257).

TPU-native semantics:
- ZeRO-2/3 == FSDP NamedSharding over the ``fsdp`` mesh axis: params and
  optimizer state are sharded by rule-based partition specs; XLA inserts
  the all-gathers/reduce-scatters DeepSpeed does manually.
- gradient accumulation is a lax.scan over microbatches inside ONE jit —
  no host round trip per microbatch.
- the step function is compiled once with donated state (in-place buffers).
"""
from __future__ import annotations

import functools
import time
from dataclasses import dataclass
from typing import Any, Callable, Dict, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..parallel.mesh import DATA_AXIS, FSDP_AXIS, batch_sharding
from ..parallel.partition import Rules, make_param_specs


class TrainState(NamedTuple):
    step: jnp.ndarray
    params: Any
    opt_state: Any


@dataclass
class TrainerConfig:
    grad_accum: int = 1
    log_every: int = 50           # LAVIS log_freq (base_task.py:181)
    donate: bool = True


def make_train_step(
    loss_fn: Callable[..., jnp.ndarray],   # (params, batch, rng) -> scalar
    optimizer: optax.GradientTransformation,
    grad_accum: int = 1,
):
    """Build a pure (state, batch, rng) -> (state, metrics) step.

    With grad_accum > 1, ``batch`` leaves must have a leading
    [grad_accum, micro_batch, ...] layout; gradients are averaged in fp32.
    """

    def single_grads(params, batch, rng):
        loss, grads = jax.value_and_grad(loss_fn)(params, batch, rng)
        return loss, grads

    def step(state: TrainState, batch, rng) -> Tuple[TrainState, Dict]:
        if grad_accum == 1:
            loss, grads = single_grads(state.params, batch, rng)
        else:
            def accum(carry, micro):
                loss_acc, grads_acc, i = carry
                loss, grads = single_grads(state.params, micro,
                                           jax.random.fold_in(rng, i))
                grads = jax.tree.map(
                    lambda a, g: a + g.astype(jnp.float32), grads_acc, grads)
                return (loss_acc + loss, grads, i + 1), None

            zeros = jax.tree.map(
                lambda p: jnp.zeros(p.shape, jnp.float32), state.params)
            (loss, grads, _), _ = jax.lax.scan(
                accum, (jnp.zeros((), jnp.float32), zeros, jnp.zeros((), jnp.int32)),
                batch)
            loss = loss / grad_accum
            grads = jax.tree.map(lambda g: g / grad_accum, grads)

        updates, new_opt = optimizer.update(grads, state.opt_state, state.params)
        new_params = optax.apply_updates(state.params, updates)
        gnorm = optax.global_norm(grads)
        metrics = {"loss": loss, "grad_norm": gnorm}
        return TrainState(state.step + 1, new_params, new_opt), metrics

    return step


class Trainer:
    """Owns sharded state + the compiled step; iterates a host data stream."""

    def __init__(
        self,
        loss_fn: Callable,
        params: Any,
        optimizer: optax.GradientTransformation,
        mesh: Mesh,
        rules: Optional[Rules] = None,
        cfg: TrainerConfig = TrainerConfig(),
    ):
        self.mesh = mesh
        self.cfg = cfg
        self.optimizer = optimizer

        param_specs = make_param_specs(params, mesh, rules)
        # Optimizer mu/nu trees mirror the param tree, and their pytree paths
        # *contain* the param paths (".../mu/layers/q_proj/kernel"), so the
        # same rule set shards them identically; scalars (count) replicate
        # via the auto rule.
        opt_shape = jax.eval_shape(optimizer.init, params)
        opt_specs = make_param_specs(opt_shape, mesh, rules)

        state_specs = TrainState(P(), param_specs, opt_specs)
        self.state_shardings = jax.tree.map(
            lambda s: NamedSharding(mesh, s), state_specs,
            is_leaf=lambda x: isinstance(x, P))
        if cfg.grad_accum > 1:
            # [accum, micro_batch, ...]: shard the micro-batch axis
            self.batch_sharding = NamedSharding(
                mesh, P(None, (DATA_AXIS, FSDP_AXIS)))
        else:
            self.batch_sharding = batch_sharding(mesh)

        # shard params + init optimizer state on-device, sharded
        params = jax.jit(lambda p: p,
                         out_shardings=self.state_shardings.params)(params)
        opt_state = jax.jit(optimizer.init,
                            out_shardings=self.state_shardings.opt_state)(params)
        self.state = TrainState(jnp.zeros((), jnp.int32), params, opt_state)

        step_fn = make_train_step(loss_fn, optimizer, cfg.grad_accum)
        self._step = jax.jit(
            step_fn,
            in_shardings=(self.state_shardings, self.batch_sharding, None),
            out_shardings=(self.state_shardings, None),
            donate_argnums=(0,) if cfg.donate else (),
        )

    def step(self, batch, rng) -> Dict[str, float]:
        batch = jax.tree.map(
            lambda x: jax.device_put(x, self.batch_sharding), batch)
        self.state, metrics = self._step(self.state, batch, rng)
        return metrics

    # -------- full-state checkpointing (params + opt moments + step) -------
    # The reference restores model+optimizer+scaler+epoch on resume (LAVIS
    # runner_base.py:656-692; HF Trainer resume_from_checkpoint,
    # MultiModalLLM/src/train/train.py:157). Deployment exports (filtered
    # params-only) are the entries' concern; these two methods own the
    # operational resume state.

    def _state_dict(self):
        return {"step": self.state.step, "params": self.state.params,
                "opt_state": self.state.opt_state}

    def save_state(self, mgr, is_best: bool = False) -> str:
        """Save the FULL TrainState through a CheckpointManager — a
        preempted run restarts warm (AdamW moments + LR-schedule step)."""
        return mgr.save(int(self.state.step), self._state_dict(),
                        is_best=is_best)

    def restore_state(self, mgr) -> Optional[int]:
        """Restore the latest full TrainState; returns the restored step
        (None if the directory holds no checkpoints). Arrays land with
        this trainer's shardings."""
        tmpl = self._state_dict()
        shardings = {"step": self.state_shardings.step,
                     "params": self.state_shardings.params,
                     "opt_state": self.state_shardings.opt_state}
        step, restored = mgr.restore_latest(tmpl, shardings)
        if step is None:
            return None
        self.state = TrainState(restored["step"], restored["params"],
                                restored["opt_state"])
        return step

    def train(self, data_iter, num_steps: int, rng=None,
              log_fn: Optional[Callable] = None) -> Dict[str, float]:
        rng = rng if rng is not None else jax.random.PRNGKey(0)
        t0 = time.time()
        last = {}
        for i in range(num_steps):
            rng, sub = jax.random.split(rng)
            batch = next(data_iter)
            metrics = self.step(batch, sub)
            if log_fn and (i % self.cfg.log_every == 0 or i == num_steps - 1):
                m = {k: float(v) for k, v in metrics.items()}
                m["steps_per_sec"] = (i + 1) / (time.time() - t0)
                log_fn(int(self.state.step), m)
            last = metrics
        return {k: float(v) for k, v in last.items()}
