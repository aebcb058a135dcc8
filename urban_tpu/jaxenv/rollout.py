"""Batched on-device rollouts: vmap(env) inside lax.scan.

Replaces the reference's fork-based multiprocess sampling
(khrylib/rl/agents/agent.py:75-100) with a single jitted program: thousands
of environments step in lockstep on one chip, auto-resetting on episode end.
Failed episodes are excluded from training via a backward success-propagation
pass (matching urban_planning/agents/urban_planning_agent.py:75-86), and GAE
runs as a scan over the time axis.
"""
from __future__ import annotations

from functools import partial
from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp

from urban_tpu.jaxenv.state import EnvSpec, PlanState
from urban_tpu.jaxenv import step as step_mod
from urban_tpu.jaxenv.step import (FAILURE_REWARD, build_obs, env_step)


class Trajectory(NamedTuple):
    obs: Tuple[jnp.ndarray, ...]   # each (T, B, ...)
    actions: jnp.ndarray           # (T, B, 2)
    log_probs: jnp.ndarray         # (T, B)
    values: jnp.ndarray            # (T, B)
    rewards: jnp.ndarray           # (T, B)
    dones: jnp.ndarray             # (T, B)
    failures: jnp.ndarray          # (T, B)
    exps: jnp.ndarray              # (T, B) exploration indicator


def packed_action_to_slots(spec: EnvSpec, state: PlanState,
                           action: jnp.ndarray) -> jnp.ndarray:
    """Translate packed-layout obs indices to slot indices.

    Only needed when driving the env from reference-layout observations
    (build_obs_packed); the rollout path uses slot-layout observations whose
    action indices ARE slot indices."""
    from urban_tpu.jaxenv.step import feature_alive
    alive = feature_alive(spec, state)
    e_ok = state.edge_alive & alive[state.edge[:, 0]] & alive[state.edge[:, 1]]
    e_rank = jnp.cumsum(e_ok)
    edge_slot = jnp.searchsorted(e_rank, action[0] + 1).astype(jnp.int32)
    n_rank = jnp.cumsum(alive)
    node_slot = jnp.searchsorted(n_rank, action[1] + 1).astype(jnp.int32)
    return jnp.stack([jnp.clip(edge_slot, 0, spec.NE - 1),
                      jnp.clip(node_slot, 0, spec.num_features - 1)])


def make_batch_fns(spec: EnvSpec, defer_rewards: bool = True):
    """Vmapped observation and step closures (slot-layout actions).

    With defer_rewards the per-env step skips stage-boundary reward
    evaluation; `apply_stage_rewards` patches it behind a batch-level
    lax.cond (most steps have no finishing episode, and cond on a scalar
    predicate executes one branch — unlike per-env selects under vmap)."""
    batch_obs = jax.vmap(lambda s: build_obs(spec, s))
    batch_step = jax.vmap(
        lambda s, a: env_step(spec, s, a, compute_rewards=not defer_rewards))
    return batch_obs, batch_step


def batched_road_network_reward(spec: EnvSpec, states: PlanState
                                ) -> jnp.ndarray:
    """Road reward over a batch of envs, plain vmap.

    Round 2 serialized this through chunked lax.map because the general
    (grid_walks x segments) proper-crossing tensor cost ~350 MB per env
    (90 GB under vmap(256)). The face decomposition's crossing test is now
    a row-mask x col-mask matmul over axis-aligned roads
    (step.py:_large_block_count), whose per-env footprint is two
    (RC, NS)-scale boolean masks — vmap(256) costs ~100 MB and rides the
    MXU, so the road phase samples at full batch speed."""
    from urban_tpu.jaxenv.step import road_network_reward
    return jax.vmap(lambda s: road_network_reward(spec, s))(states)


def apply_stage_rewards(spec: EnvSpec, states: PlanState, reward, info):
    """Compute stage-boundary rewards only when some env finished."""
    from urban_tpu.jaxenv.step import FAILURE_REWARD, land_use_stage_reward
    B = reward.shape[0]
    lu_done = info['lu_done']
    rd_done = info['rd_done']
    fail = info['failure']

    lu_r = jax.lax.cond(
        jnp.any(lu_done & ~fail),
        lambda: jax.vmap(lambda s: land_use_stage_reward(spec, s))(states),
        lambda: jnp.zeros(B))
    reward = jnp.where(lu_done & ~fail, lu_r, reward)
    land_use_reward = jnp.where(lu_done & ~fail, lu_r,
                                states.land_use_reward)
    states = states.replace(land_use_reward=land_use_reward)
    if spec.road_network_weight > 0 and not spec.skip_road:
        rd_r = jax.lax.cond(
            jnp.any(rd_done & ~fail),
            lambda: spec.road_network_weight
            * batched_road_network_reward(spec, states),
            lambda: jnp.zeros(B))
        reward = jnp.where(rd_done & ~fail, rd_r, reward)
    return states, reward


def broadcast_state(state: PlanState, batch: int) -> PlanState:
    return jax.tree.map(
        lambda x: jnp.broadcast_to(x, (batch,) + x.shape), state)


@partial(jax.jit, static_argnames=('spec', 'model', 'num_steps',
                                   'mean_action'))
def rollout(spec: EnvSpec, model, params, init_state: PlanState,
            start_state: PlanState, rng: jnp.ndarray, num_steps: int,
            noise_rate: float = 1.0, mean_action: bool = False):
    """Collect (T, B) trajectories with auto-reset.

    init_state: single-env reset target; start_state: batched current states.
    Returns (final_states, Trajectory)."""
    batch_obs, batch_step = make_batch_fns(spec)
    B = start_state.stage.shape[0]
    init_b = broadcast_state(init_state, B)

    def scan_body(carry, step_rng):
        state = carry
        # auto-reset finished envs
        state = jax.tree.map(
            lambda i, s: jnp.where(
                state.done.reshape((-1,) + (1,) * (s.ndim - 1)), i, s),
            init_b, state)
        obs = batch_obs(state)
        rng_a, rng_e = jax.random.split(step_rng)
        explore = jax.random.uniform(rng_e, (B,)) < noise_rate
        use_mean = jnp.logical_or(mean_action, ~explore)
        action, log_prob, value = model.apply(
            params, obs, rng_a, use_mean, method='sample_action_logp_value')
        next_state, reward, done, info = batch_step(state, action)
        next_state, reward = apply_stage_rewards(spec, next_state, reward,
                                                 info)
        out = (obs, action, log_prob[..., 0], value[..., 0], reward, done,
               info['failure'], (~use_mean).astype(jnp.float32))
        return next_state, out

    rngs = jax.random.split(rng, num_steps)
    final_state, outs = jax.lax.scan(scan_body, start_state, rngs)
    (obs, actions, log_probs, values, rewards, dones, failures, exps) = outs
    traj = Trajectory(obs=obs, actions=actions, log_probs=log_probs,
                      values=values, rewards=rewards, dones=dones,
                      failures=failures, exps=exps)
    return final_state, traj


@partial(jax.jit, static_argnames=('spec', 'model', 'num_steps'))
def rollout_bench(spec: EnvSpec, model, params, init_state: PlanState,
                  start_state: PlanState, rng: jnp.ndarray, num_steps: int):
    """Throughput-measurement rollout: no trajectory storage, returns only
    episode statistics (the PPO path stores trajectories; pure env+policy
    stepping is what the steps/sec benchmark measures)."""
    batch_obs, batch_step = make_batch_fns(spec)
    B = start_state.stage.shape[0]
    init_b = broadcast_state(init_state, B)

    # per-cause failure histogram: one counter per FAIL_* taxonomy bit
    # (env_step info['failure_code']); cheap (N_FAIL_BITS sums per step)
    # and makes the bench report WHY episodes fail, mirroring the
    # reference's failing-action logging (reference city.py:450-457)
    n_bits = len(step_mod.FAILURE_BIT_NAMES)

    def scan_body(carry, step_rng):
        state, n_eps, n_fail, reward_sum, code_hist = carry
        state = jax.tree.map(
            lambda i, s: jnp.where(
                state.done.reshape((-1,) + (1,) * (s.ndim - 1)), i, s),
            init_b, state)
        obs = batch_obs(state)
        action, _, _ = model.apply(params, obs, step_rng,
                                   jnp.zeros(B, bool),
                                   method='sample_action_logp_value')
        next_state, reward, done, info = batch_step(state, action)
        next_state, reward = apply_stage_rewards(spec, next_state, reward,
                                                 info)
        n_eps = n_eps + jnp.sum(done)
        n_fail = n_fail + jnp.sum(info['failure'])
        code = info['failure_code'][None, :]                    # (1, B)
        bits = jnp.arange(n_bits, dtype=jnp.int32)[:, None]     # (K, 1)
        code_hist = code_hist + jnp.sum((code >> bits) & 1, axis=1)
        reward_sum = reward_sum + jnp.sum(jnp.where(done & ~info['failure'],
                                                    reward, 0.0))
        return (next_state, n_eps, n_fail, reward_sum, code_hist), None

    rngs = jax.random.split(rng, num_steps)
    (state, n_eps, n_fail, reward_sum, code_hist), _ = jax.lax.scan(
        scan_body, (start_state, jnp.asarray(0), jnp.asarray(0),
                    jnp.asarray(0.0), jnp.zeros(n_bits, jnp.int32)), rngs)
    return state, n_eps, n_fail, reward_sum, code_hist


@partial(jax.jit, static_argnames=('spec', 'model', 'num_steps'))
def eval_rollout(spec: EnvSpec, model, params, start_state: PlanState,
                 rng: jnp.ndarray, num_steps: int):
    """Greedy evaluation episodes: B fresh envs stepped with mean actions
    and FROZEN once done (no auto-reset), so the terminal plan states
    survive for scoring/export (reference greedy eval episode,
    urban_planning_agent.py:402-467).

    Returns (final_states, total_reward (B,), done (B,), failure (B,))."""
    batch_obs, batch_step = make_batch_fns(spec)
    B = start_state.stage.shape[0]

    def body(carry, step_rng):
        state, acc = carry
        obs = batch_obs(state)
        action, _, _ = model.apply(params, obs, step_rng,
                                   jnp.ones(B, bool),
                                   method='sample_action_logp_value')
        nxt, r, d, info = batch_step(state, action)
        nxt, r = apply_stage_rewards(spec, nxt, r, info)
        frozen = state.done
        nxt = jax.tree.map(
            lambda old, new: jnp.where(
                frozen.reshape((-1,) + (1,) * (new.ndim - 1)), old, new),
            state, nxt)
        acc = acc + jnp.where(frozen, 0.0, r)
        return (nxt, acc), None

    rngs = jax.random.split(rng, num_steps)
    (final_state, total_r), _ = jax.lax.scan(body, (start_state,
                                                    jnp.zeros(B)), rngs)
    return final_state, total_r, final_state.done, final_state.failure


@jax.jit
def episode_success_weights(dones: jnp.ndarray, failures: jnp.ndarray,
                            rewards: jnp.ndarray = None) -> jnp.ndarray:
    """(T, B) weight: 1 for steps of successful episodes, else 0.

    Mirrors the reference filter: episodes terminating with FAILURE or
    INTERMEDIATE reward are excluded (urban_planning_agent.py:75-86).
    Success is the explicit done-without-failure flag — a reward-sign test
    would misclassify a legitimate terminal reward of exactly 0 (the
    reference tests reward != FAILURE_REWARD, not reward > 0); truncation
    (ending mid-episode, the INTERMEDIATE case) is the backward pass's
    zero init on never-terminated trailing segments. The rewards argument
    is accepted for backward compatibility and unused."""
    success_at_end = dones & ~failures

    def back(carry, x):
        done_t, succ_t = x
        flag = jnp.where(done_t, succ_t.astype(jnp.float32), carry)
        return flag, flag

    init = jnp.zeros(dones.shape[1])
    _, flags = jax.lax.scan(back, init, (dones[::-1], success_at_end[::-1]))
    return flags[::-1]


@jax.jit
def normalize_advantages(advantages: jnp.ndarray,
                         weights: jnp.ndarray) -> jnp.ndarray:
    """Standardize advantages over the rows that actually train
    (weights > 0). The reference exposes the same dormant switch as
    estimate_advantages' normalize_rewards arg
    (khrylib/rl/core/common.py:5,23-24); here the statistics exclude
    failed-episode and truncated filler rows so they cannot skew the
    scale. With gamma=1/tau=0 the raw TD-error advantages shrink to
    ~1e-2 once the value net fits, leaving the surrogate gradient far
    below the entropy bonus; standardizing restores a scale-free policy
    gradient."""
    wsum = jnp.maximum(weights.sum(), 1.0)
    mu = (advantages * weights).sum() / wsum
    var = (((advantages - mu) ** 2) * weights).sum() / wsum
    return (advantages - mu) / jnp.sqrt(var + 1e-8)


@partial(jax.jit, static_argnames=('gamma', 'tau'))
def batched_gae(rewards: jnp.ndarray, dones: jnp.ndarray,
                values: jnp.ndarray, gamma: float, tau: float):
    """GAE over the (T, B) rollout; episode boundaries cut by dones
    (reference khrylib/rl/core/common.py:5-26 semantics with mask=1-done)."""
    masks = 1.0 - dones.astype(jnp.float32)

    def back(carry, x):
        prev_value, prev_adv = carry
        r, m, v = x
        delta = r + gamma * prev_value * m - v
        adv = delta + gamma * tau * prev_adv * m
        return (v, adv), adv

    B = rewards.shape[1]
    (_, _), adv_rev = jax.lax.scan(
        back, (jnp.zeros(B), jnp.zeros(B)),
        (rewards[::-1], masks[::-1], values[::-1]))
    advantages = adv_rev[::-1]
    returns = values + advantages
    return advantages, returns
