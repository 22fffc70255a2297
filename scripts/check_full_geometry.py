#!/usr/bin/env python
"""Full-geometry AOT compile check: the REAL 8B/14B training step at
tp=2 x fsdp=4 on an 8-virtual-device mesh, compile-only (no buffers are
ever allocated — jit(...).lower(abstract shapes).compile() runs the SPMD
partitioner and buffer assignment exactly as a real 8-chip run would).

Validates what dryrun_multichip (tiny shapes) cannot: that the rule-based
partition specs divide the true 8B dims (4096/32/11008) across tp=2
without remainder, and reports XLA's per-device HBM estimate for the
sharded step so a real v5e-8 launch is known to fit BEFORE burning pod
time. (The reference never had this: DeepSpeed geometry errors surface at
step 0 on the pod.)

    python scripts/check_full_geometry.py            # LoRA step (default)
    python scripts/check_full_geometry.py --full     # full-finetune step
"""
import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

_N_DEV = "16" if "--devices=16" in sys.argv else \
         "32" if "--devices=32" in sys.argv else "8"
os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "")
                           + f" --xla_force_host_platform_device_count={_N_DEV}")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--model", choices=["8b", "14b"], default="8b")
    ap.add_argument("--full", action="store_true",
                    help="full finetune (no LoRA) — the heavier state")
    ap.add_argument("--tp", type=int, default=2)
    ap.add_argument("--devices", type=int, default=8, choices=(8, 16, 32),
                    help="virtual device count (pass as --devices=N); fsdp "
                         "gets devices/tp")
    ap.add_argument("--batch", type=int, default=8, help="global batch")
    ap.add_argument("--seq", type=int, default=1024)
    args = ap.parse_args()

    import jax
    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    from jax.sharding import NamedSharding, PartitionSpec as P

    from seed_tpu.models import llama as M
    from seed_tpu.parallel import LLAMA_TP_RULES, auto_mesh
    from seed_tpu.parallel.mesh import DATA_AXIS, FSDP_AXIS
    from seed_tpu.parallel.partition import make_param_specs
    from seed_tpu.train import (adamw, apply_lora, cosine_with_floor,
                                cross_entropy, init_lora)
    from seed_tpu.train.trainer import TrainState, make_train_step

    cfg = {"8b": M.SEED_LLAMA_8B, "14b": M.SEED_LLAMA_14B}[args.model]
    mesh = auto_mesh(tp=args.tp)
    print(f"mesh: {dict(zip(mesh.axis_names, mesh.devices.shape))}", flush=True)

    # abstract params: real 8B shapes, zero bytes allocated
    base_shape = jax.eval_shape(
        lambda k: M.init_llama(k, cfg, jnp.bfloat16), jax.random.PRNGKey(0))
    if args.full:
        params_shape = base_shape

        def loss_fn(p, batch, rng):
            logits = M.forward(p, batch["input_ids"], cfg,
                               attn_mask=batch["attention_mask"], remat=True)
            return cross_entropy(logits[:, :-1], batch["labels"][:, 1:])
    else:
        lora_shape = jax.eval_shape(
            lambda k: init_lora(k, base_shape, r=16, alpha=32),
            jax.random.PRNGKey(1))
        params_shape = {"base": base_shape, "lora": lora_shape}

        def loss_fn(p, batch, rng):
            merged = apply_lora(p["base"], p["lora"])
            logits = M.forward(merged, batch["input_ids"], cfg,
                               attn_mask=batch["attention_mask"], remat=True)
            return cross_entropy(logits[:, :-1], batch["labels"][:, 1:])

    opt = adamw(cosine_with_floor(1.5e-4, 500, 30000, 0.05),
                b1=0.9, b2=0.95, eps=1e-5, weight_decay=0.05, clip_norm=1.0,
                params=params_shape)
    param_specs = make_param_specs(params_shape, mesh, LLAMA_TP_RULES)
    opt_shape = jax.eval_shape(opt.init, params_shape)
    opt_specs = make_param_specs(opt_shape, mesh, LLAMA_TP_RULES)
    state_specs = TrainState(P(), param_specs, opt_specs)
    state_shardings = jax.tree.map(
        lambda s: NamedSharding(mesh, s), state_specs,
        is_leaf=lambda x: isinstance(x, P))
    batch_sharding = NamedSharding(mesh, P((DATA_AXIS, FSDP_AXIS)))

    B, S = args.batch, args.seq
    batch_shape = {
        "input_ids": jax.ShapeDtypeStruct((B, S), jnp.int32),
        "attention_mask": jax.ShapeDtypeStruct((B, S), jnp.bool_),
        "labels": jax.ShapeDtypeStruct((B, S), jnp.int32),
    }
    state_shape = TrainState(
        jax.ShapeDtypeStruct((), jnp.int32), params_shape,
        opt_shape)
    rng_shape = jax.ShapeDtypeStruct((2,), jnp.uint32)

    step = jax.jit(make_train_step(loss_fn, opt),
                   in_shardings=(state_shardings, batch_sharding, None),
                   out_shardings=(state_shardings, None),
                   donate_argnums=(0,))
    print("lowering...", flush=True)
    lowered = step.lower(state_shape, batch_shape, rng_shape)
    print("compiling (SPMD partitioner + buffer assignment)...", flush=True)
    compiled = lowered.compile()
    mem = compiled.memory_analysis()
    gb = 1 << 30
    print(f"ok: compiled. per-device memory estimate:", flush=True)
    print(f"  arguments : {mem.argument_size_in_bytes / gb:.2f} GiB")
    print(f"  outputs   : {mem.output_size_in_bytes / gb:.2f} GiB")
    print(f"  temp      : {mem.temp_size_in_bytes / gb:.2f} GiB")
    print(f"  aliased   : {mem.alias_size_in_bytes / gb:.2f} GiB")
    total = (mem.argument_size_in_bytes + mem.output_size_in_bytes
             + mem.temp_size_in_bytes - mem.alias_size_in_bytes)
    print(f"  live total: {total / gb:.2f} GiB "
          f"({'FITS' if total < 15.75 * gb else 'EXCEEDS'} one v5e)")


if __name__ == "__main__":
    main()
