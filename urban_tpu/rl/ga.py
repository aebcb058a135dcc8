"""Minimal genetic-algorithm optimizer.

Drop-in replacement for the pygad configuration the reference uses
(reference: urban_planning/train_ga.py:69-85): steady-state selection,
single-point crossover, random per-gene mutation, keep-parents elitism, and
a saturate-N stop criterion. Fitness evaluation is delegated to a callable
(greedy env episodes); population fitness evaluations are embarrassingly
parallel and vmap over the batched TPU environment when used with
urban_tpu.jaxenv.
"""
from __future__ import annotations

from dataclasses import dataclass, field
from typing import Callable, List, Optional, Tuple

import numpy as np


@dataclass
class GAConfig:
    num_generations: int = 100
    num_parents_mating: int = 2
    sol_per_pop: int = 20
    num_genes: int = 10
    init_range_low: float = -5.0
    init_range_high: float = 5.0
    keep_parents: int = 1
    mutation_percent_genes: float = 10.0
    mutation_range: Tuple[float, float] = (-1.0, 1.0)
    saturate_generations: int = 10
    seed: int = 0


class GA:

    def __init__(self, cfg: GAConfig, fitness_func: Callable[[np.ndarray], float],
                 on_generation: Optional[Callable] = None,
                 population_fitness_func: Optional[Callable] = None):
        """population_fitness_func, when given, evaluates the WHOLE
        population in one call ((P, G) -> (P,)) — the vmapped TPU-env
        evaluator (ga_population_fitness) plugs in here."""
        self.cfg = cfg
        self.fitness_func = fitness_func
        self.population_fitness_func = population_fitness_func
        self.on_generation = on_generation
        self.rng = np.random.default_rng(cfg.seed)
        self.population = self.rng.uniform(
            cfg.init_range_low, cfg.init_range_high,
            size=(cfg.sol_per_pop, cfg.num_genes))
        self.best_solutions_fitness: List[float] = []
        self.last_generation_fitness: Optional[np.ndarray] = None
        self.generations_completed = 0

    def _evaluate(self) -> np.ndarray:
        if self.population_fitness_func is not None:
            return np.asarray(self.population_fitness_func(self.population))
        return np.array([self.fitness_func(sol) for sol in self.population])

    def run(self) -> None:
        cfg = self.cfg
        fitness = self._evaluate()
        for gen in range(cfg.num_generations):
            order = np.argsort(fitness)[::-1]
            parents = self.population[order[:max(cfg.num_parents_mating, 2)]]
            # children by single-point crossover + mutation
            num_children = cfg.sol_per_pop - cfg.keep_parents
            children = np.empty((num_children, cfg.num_genes))
            for i in range(num_children):
                pa, pb = parents[i % len(parents)], \
                    parents[(i + 1) % len(parents)]
                cut = int(self.rng.integers(1, cfg.num_genes))
                child = np.concatenate([pa[:cut], pb[cut:]])
                n_mut = max(1, int(round(cfg.num_genes
                                         * cfg.mutation_percent_genes / 100)))
                idx = self.rng.choice(cfg.num_genes, size=n_mut, replace=False)
                child[idx] += self.rng.uniform(*cfg.mutation_range, size=n_mut)
                children[i] = child
            elite = self.population[order[:cfg.keep_parents]]
            self.population = np.vstack([elite, children])
            fitness = self._evaluate()
            self.last_generation_fitness = fitness
            self.best_solutions_fitness.append(float(fitness.max()))
            self.generations_completed = gen + 1
            if self.on_generation is not None:
                self.on_generation(self)
            # saturate stop: no improvement for N generations
            s = cfg.saturate_generations
            if len(self.best_solutions_fitness) > s and \
                    self.best_solutions_fitness[-1] <= \
                    self.best_solutions_fitness[-1 - s]:
                break

    def best_solution(self):
        fitness = self.last_generation_fitness
        if fitness is None:
            fitness = self._evaluate()
        idx = int(np.argmax(fitness))
        return self.population[idx], float(fitness[idx]), idx


def make_ga_population_fitness(spec, init_state, num_steps: int,
                               mean_action: bool = False, seed: int = 0):
    """Whole-population fitness on the batched TPU environment.

    One jitted program evaluates every gene as its own environment: env i is
    driven by gene i's linear policy (models.baseline.ga_logits_jax), frozen
    once done; fitness = accumulated episode reward. Replaces the host-serial
    per-gene greedy episodes (reference urban_planning/train_ga.py:58-60) —
    the one baseline that vmaps perfectly (SURVEY.md §7 step 8)."""
    import jax
    import jax.numpy as jnp
    from functools import partial
    from urban_tpu.jaxenv.rollout import (apply_stage_rewards,
                                          broadcast_state, make_batch_fns)
    from urban_tpu.models.baseline import ga_logits_jax

    batch_obs, batch_step = make_batch_fns(spec)

    @partial(jax.jit, static_argnames=())
    def run_population(genes, rng):
        P = genes.shape[0]
        states = broadcast_state(init_state, P)

        def select(obs1, gene, r):
            lu_logits, rd_logits = ga_logits_jax(obs1, gene)
            lu_mask, rd_mask = obs1[6], obs1[7]
            lu_l = jnp.where(lu_mask, lu_logits, -jnp.inf)
            rd_l = jnp.where(rd_mask, rd_logits, -jnp.inf)
            if mean_action:
                lu = jnp.argmax(lu_l)
                rd = jnp.argmax(rd_l)
            else:
                r1, r2 = jax.random.split(r)
                lu = jax.random.categorical(r1, lu_l)
                rd = jax.random.categorical(r2, rd_l)
            return jnp.stack([lu, rd]).astype(jnp.int32)

        def body(carry, step_rng):
            state, acc = carry
            obs = batch_obs(state)
            rngs = jax.random.split(step_rng, P)
            action = jax.vmap(select)(obs, genes, rngs)
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
        (final, acc), _ = jax.lax.scan(body, (states, jnp.zeros(P)), rngs)
        # unfinished or failed episodes score the failure reward
        ok = final.done & ~final.failure
        return jnp.where(ok, acc, -1.0)

    counter = [seed]

    def population_fitness(population: np.ndarray) -> np.ndarray:
        counter[0] += 1
        rng = jax.random.PRNGKey(counter[0])
        return np.asarray(run_population(jnp.asarray(population,
                                                     dtype=jnp.float32), rng))

    return population_fitness
