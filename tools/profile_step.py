"""Ablation profiler for the batched rollout step.

Times scan variants that isolate the components of one rollout step
(state copy / obs build / model forward / env step / stage rewards) on the
attached device. Used to drive the PERF_NOTES optimization ledger.

Usage: python tools/profile_step.py [B] [T]
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp
from functools import partial


def timeit(fn, *args, n=3, label=''):
    try:
        out = fn(*args)
        _ = np.asarray(jax.tree.leaves(out)[0])  # sync
    except Exception as e:
        print(f'{label:44s} FAILED: {type(e).__name__}: {str(e)[:120]}')
        return None
    best = 1e9
    for _ in range(n):
        t0 = time.time()
        out = fn(*args)
        _ = np.asarray(jax.tree.leaves(out)[0])
        best = min(best, time.time() - t0)
    print(f'{label:44s} {best*1000:9.1f} ms')
    return best


def main():
    from urban_tpu.utils.config import Config
    from urban_tpu.envs.plan_client import PlanClient
    from urban_tpu.jaxenv.state import build_env_spec, build_initial_state
    from urban_tpu.jaxenv.rollout import (rollout_bench, broadcast_state,
                                          make_batch_fns, apply_stage_rewards)
    from urban_tpu.jaxenv.step import build_obs, env_step
    from urban_tpu.models.model import create_model

    B = int(sys.argv[1]) if len(sys.argv) > 1 else 128
    T = int(sys.argv[2]) if len(sys.argv) > 2 else 30

    cfg = Config('hlg', 0, tmp=True)
    plc = PlanClient(cfg.objectives_plan, cfg.init_plan)
    caps = dict(KV=20, NP=256, NS=512, NPT=320, NE=2304)
    spec = build_env_spec(cfg, plc, max_steps=cfg.max_sequence_length,
                          caps=caps)
    init_state = build_initial_state(spec, plc)
    cfg.state_encoder_specs = dict(cfg.state_encoder_specs)
    cfg.state_encoder_specs['max_num_nodes'] = spec.num_features
    cfg.state_encoder_specs['max_num_edges'] = spec.NE
    model = create_model(cfg, 'sgnn')
    obs0 = jax.tree.map(lambda x: x[None], build_obs(spec, init_state))
    params = model.init(jax.random.PRNGKey(0), obs0)
    start = broadcast_state(init_state.replace(done=jnp.asarray(True)), B)
    init_b = broadcast_state(init_state, B)
    batch_obs, batch_step = make_batch_fns(spec)
    rng = jax.random.PRNGKey(1)

    state_bytes = sum(x.size * x.dtype.itemsize
                      for x in jax.tree.leaves(start))
    print(f'B={B} T={T}  logical state bytes/batch: {state_bytes/1e6:.1f} MB')

    # full bench rollout
    timeit(lambda: rollout_bench(spec, model, params, init_state, start,
                                 rng, T),
           label='full rollout_bench')

    # state-copy only: scan carrying state, auto-reset select each step
    @partial(jax.jit, static_argnames=())
    def scan_copy(start_state):
        def body(s, _):
            s2 = jax.tree.map(
                lambda i, x: jnp.where(
                    s.done.reshape((-1,) + (1,) * (x.ndim - 1)), i, x),
                init_b, s)
            return s2, None
        out, _ = jax.lax.scan(body, start_state, None, length=T)
        return out.stage
    timeit(scan_copy, start, label='scan: auto-reset state copy only')

    # obs-only
    @jax.jit
    def scan_obs(start_state):
        def body(s, _):
            obs = batch_obs(s)
            return s, jnp.sum(obs[0])
        _, o = jax.lax.scan(body, start_state, None, length=T)
        return o
    timeit(scan_obs, start, label='scan: build_obs only')

    # model-only (fixed obs rebuilt each step to keep comparable)
    @jax.jit
    def scan_model(start_state, rng):
        def body(carry, step_rng):
            s = carry
            obs = batch_obs(s)
            action, lp, v = model.apply(params, obs, step_rng,
                                        jnp.zeros(B, bool),
                                        method='sample_action_logp_value')
            return s, jnp.sum(v)
        rngs = jax.random.split(rng, T)
        _, o = jax.lax.scan(body, start_state, rngs)
        return o
    timeit(scan_model, start, rng, label='scan: obs + model forward')

    # env-step only (fixed action, no model, with stage rewards)
    @jax.jit
    def scan_env(start_state):
        def body(s, _):
            s = jax.tree.map(
                lambda i, x: jnp.where(
                    s.done.reshape((-1,) + (1,) * (x.ndim - 1)), i, x),
                init_b, s)
            act = jnp.zeros((B, 2), jnp.int32)
            s2, r, d, info = batch_step(s, act)
            s2, r = apply_stage_rewards(spec, s2, r, info)
            return s2, r
        out, r = jax.lax.scan(body, start_state, None, length=T)
        return r
    timeit(scan_env, start, label='scan: env step only (action=0)')

    # env-step without stage rewards
    @jax.jit
    def scan_env_nr(start_state):
        def body(s, _):
            s = jax.tree.map(
                lambda i, x: jnp.where(
                    s.done.reshape((-1,) + (1,) * (x.ndim - 1)), i, x),
                init_b, s)
            act = jnp.zeros((B, 2), jnp.int32)
            s2, r, d, info = batch_step(s, act)
            return s2, r
        out, r = jax.lax.scan(body, start_state, None, length=T)
        return r
    timeit(scan_env_nr, start, label='scan: env step, no stage rewards')

    # single sub-phases of apply_land_use under vmap
    from urban_tpu.jaxenv import step as stp

    @jax.jit
    def scan_lu(start_state):
        def body(s, _):
            act = jnp.zeros((B,), jnp.int32)
            s2, fail = jax.vmap(lambda ss, aa: stp.apply_land_use(
                spec, ss, aa))(s, act)
            return s2, fail
        out, f = jax.lax.scan(body, start_state, None, length=T)
        return f
    timeit(scan_lu, start, label='scan: apply_land_use only')

    @jax.jit
    def scan_mask(start_state):
        def body(s, _):
            t = jax.vmap(lambda ss: stp.pending_land_use_type(spec, ss))(s)
            m = jax.vmap(lambda ss, tt: stp.land_use_mask(spec, ss, tt))(s, t)
            return s, jnp.sum(m)
        _, m = jax.lax.scan(body, start_state, None, length=T)
        return m
    timeit(scan_mask, start, label='scan: land_use_mask only')


if __name__ == '__main__':
    main()
