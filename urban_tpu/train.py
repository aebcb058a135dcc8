"""PPO training CLI (reference: urban_planning/train.py:14-88).

Usage:
  python -m urban_tpu.train --cfg grid --global_seed 111 [--agent rl-sgnn]
"""
from __future__ import annotations

import numpy as np
from absl import app

from urban_tpu.utils.flags import tolerant_flags as flags

from urban_tpu.agents.urban_agent import UrbanPlanningAgent
from urban_tpu.utils.config import Config

flags.DEFINE_string('root_dir', '/tmp/urban_tpu_runs',
                    'Root directory for logs/summaries/checkpoints.')
flags.DEFINE_string('cfg', None, 'Configuration file of rl training.')
flags.DEFINE_bool('tmp', False, 'Whether to use temporary storage.')
flags.DEFINE_enum('agent', 'rl-sgnn', ['rl-sgnn', 'rl-mlp'], 'Agent type.')
flags.DEFINE_bool('separate_train', True,
                  'Whether to separate the training of land use and road '
                  'planning into two phases.')
flags.DEFINE_integer('num_threads', 1,
                     'Sampler threads (the host sampler is single-process; '
                     'rollout scale comes from the batched TPU env).')
flags.DEFINE_integer('global_seed', None, 'Seed for env and weight init.')
flags.DEFINE_string('iteration', '0',
                    'Start iteration (number or "best"); nonzero resumes '
                    'from a checkpoint.')
flags.DEFINE_bool('restore_best_rewards', True,
                  'Restore best rewards on resume (False for finetuning '
                  'with a new reward).')
flags.DEFINE_integer('max_num_iterations', 0,
                     'Override cfg max_num_iterations when > 0.')
flags.DEFINE_integer('num_episodes_per_iteration', 0,
                     'Override cfg num_episodes_per_iteration when > 0.')

FLAGS = flags.FLAGS


def train_one_iteration(agent: UrbanPlanningAgent, iteration: int) -> None:
    agent.optimize(iteration)
    agent.save_checkpoint(iteration)


def main_loop(_):
    from urban_tpu.utils.jaxcache import enable_compilation_cache
    enable_compilation_cache()
    cfg = Config(FLAGS.cfg, FLAGS.global_seed, FLAGS.tmp, FLAGS.root_dir,
                 FLAGS.agent)
    if FLAGS.max_num_iterations > 0:
        cfg.max_num_iterations = FLAGS.max_num_iterations
    if FLAGS.num_episodes_per_iteration > 0:
        cfg.num_episodes_per_iteration = FLAGS.num_episodes_per_iteration
    np.random.seed(cfg.seed)

    checkpoint = int(FLAGS.iteration) if FLAGS.iteration.isnumeric() \
        else FLAGS.iteration
    agent = UrbanPlanningAgent(cfg=cfg, num_threads=FLAGS.num_threads,
                               training=True, checkpoint=checkpoint,
                               restore_best_rewards=FLAGS.restore_best_rewards)

    if FLAGS.separate_train and not cfg.skip_land_use and not cfg.skip_road:
        agent.freeze_road()
        for iteration in range(agent.start_iteration, cfg.max_num_iterations):
            train_one_iteration(agent, iteration)
        agent.freeze_land_use()
        for iteration in range(cfg.max_num_iterations,
                               2 * cfg.max_num_iterations):
            train_one_iteration(agent, iteration)
    else:
        if cfg.skip_land_use:
            agent.freeze_land_use()
        for iteration in range(agent.start_iteration, cfg.max_num_iterations):
            train_one_iteration(agent, iteration)

    agent.logger.info('training done!')


if __name__ == '__main__':
    flags.mark_flags_as_required(['cfg', 'global_seed'])
    app.run(main_loop)
