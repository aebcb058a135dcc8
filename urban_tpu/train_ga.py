"""Genetic-algorithm training CLI (reference: urban_planning/train_ga.py:17-102).

Usage:
  python -m urban_tpu.train_ga --cfg hlg --global_seed 111
"""
from __future__ import annotations

from pprint import pprint

import numpy as np
from absl import app

from urban_tpu.utils.flags import tolerant_flags as flags

from urban_tpu.agents.urban_agent import UrbanPlanningAgent
from urban_tpu.rl.ga import GA, GAConfig
from urban_tpu.utils.config import Config

flags.DEFINE_string('root_dir', '/tmp/urban_tpu_runs', 'Root directory.')
flags.DEFINE_string('cfg', None, 'Configuration file.')
flags.DEFINE_bool('tmp', False, 'Whether to use temporary storage.')
flags.DEFINE_bool('mean_action', True, 'Whether to use greedy strategy.')
flags.DEFINE_bool('visualize', False, 'Visualize the planning process.')
flags.DEFINE_bool('only_road', False, 'Only road planning.')
flags.DEFINE_integer('global_seed', None, 'Seed.')
flags.DEFINE_integer('sol_per_pop', 20, 'Solutions per population.')
flags.DEFINE_integer('num_generations', 100, 'Number of generations.')
flags.DEFINE_integer('num_parents_mating', 2, 'Parents for mating.')
flags.DEFINE_integer('init_range_low', -5, 'Gene init low.')
flags.DEFINE_integer('init_range_high', 5, 'Gene init high.')
flags.DEFINE_integer('mutation_percent_genes', 10, 'Mutation percentage.')
flags.DEFINE_bool('tpu_env', True, 'Evaluate the whole population as one '
                  'vmapped batch on the jitted TPU environment (the host '
                  'path evaluates genes one greedy episode at a time).')
flags.DEFINE_string('export_geojson', '', 'Also export the best solution\'s '
                    'greedy plan to this geojson path.')

FLAGS = flags.FLAGS


def main_loop(_):
    from urban_tpu.utils.jaxcache import enable_compilation_cache
    enable_compilation_cache()
    cfg = Config(FLAGS.cfg, FLAGS.global_seed, FLAGS.tmp, FLAGS.root_dir, 'ga')
    np.random.seed(cfg.seed)
    agent = UrbanPlanningAgent(cfg=cfg, num_threads=1, training=False,
                               checkpoint=0, restore_best_rewards=True)
    if FLAGS.only_road:
        agent.freeze_land_use()

    def fitness_func(solution):
        fitness, _ = agent.fitness_ga(solution, num_samples=1,
                                      mean_action=False,
                                      visualize=FLAGS.visualize)
        return fitness

    population_fitness = None
    if FLAGS.tpu_env and not FLAGS.visualize and not FLAGS.only_road:
        from urban_tpu.envs.plan_client import PlanClient
        from urban_tpu.jaxenv.state import (build_env_spec,
                                            build_initial_state)
        from urban_tpu.rl.ga import make_ga_population_fitness
        plc = PlanClient(cfg.objectives_plan, cfg.init_plan)
        spec = build_env_spec(cfg, plc, max_steps=cfg.max_sequence_length)
        init_state = build_initial_state(spec, plc)
        population_fitness = make_ga_population_fitness(
            spec, init_state,
            num_steps=getattr(cfg, 'original_max_sequence_length',
                              cfg.max_sequence_length),
            mean_action=False, seed=cfg.seed)

    def report_func(instance):
        print(f'Generation: {instance.generations_completed}')
        print(f'Best Fitness: {instance.best_solutions_fitness[-1]: .4f}')
        avg = (sum(instance.last_generation_fitness)
               / len(instance.last_generation_fitness))
        print(f'Last Generation Average Fitness: {avg: .4f}')
        print()

    ga = GA(GAConfig(num_generations=FLAGS.num_generations,
                     num_parents_mating=FLAGS.num_parents_mating,
                     sol_per_pop=FLAGS.sol_per_pop,
                     num_genes=2 * agent.node_dim + 1,
                     init_range_low=FLAGS.init_range_low,
                     init_range_high=FLAGS.init_range_high,
                     keep_parents=1,
                     mutation_percent_genes=FLAGS.mutation_percent_genes,
                     saturate_generations=10,
                     seed=cfg.seed),
            fitness_func, on_generation=report_func,
            population_fitness_func=population_fitness)
    ga.run()

    best_solution, best_fitness, _ = ga.best_solution()
    print(f'Parameters of the best solution : {best_solution}')
    print(f'Fitness value of the best solution = {best_fitness}')
    agent.save_ga(best_solution, best_fitness)

    _, plan = agent.fitness_ga(best_solution, num_samples=1,
                               visualize=FLAGS.visualize)
    pprint({k: v for k, v in plan.items() if not k.endswith('gdf')},
           indent=4, sort_dicts=False)
    if FLAGS.export_geojson and 'gdf' in plan:
        from urban_tpu.io.geojson import save_geojson
        save_geojson(plan['gdf'], FLAGS.export_geojson)
        print(f'exported best greedy plan to {FLAGS.export_geojson}')


if __name__ == '__main__':
    flags.mark_flags_as_required(['cfg', 'global_seed'])
    app.run(main_loop)
