"""absl flag helpers: tolerate repeated definitions across CLI modules.

The three CLI entry points share flag names (like the reference's
train/eval/train_ga); importing more than one in a single process (tests,
tooling) must not crash on duplicate registration."""
from absl import flags


class _TolerantFlags:
    """Proxy over absl.flags that ignores duplicate flag definitions."""

    def __getattr__(self, name):
        attr = getattr(flags, name)
        if name.startswith('DEFINE'):
            def define(*args, **kwargs):
                try:
                    return attr(*args, **kwargs)
                except flags._exceptions.DuplicateFlagError:
                    return None
            return define
        return attr


tolerant_flags = _TolerantFlags()
