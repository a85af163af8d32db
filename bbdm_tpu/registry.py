"""Name -> class registries for runners and datasets.

Mirrors the reference's `Register.py:11-46`: a decorator-based registry keyed
by string names referenced from the YAML config (``runner:`` and
``data.dataset_type:``).
"""

from __future__ import annotations


class Register(dict):
    """A dict that registers callables under explicit names."""

    def __init__(self, registry_name: str):
        super().__init__()
        self._name = registry_name

    def register(self, target):
        """Register under the callable's own __name__."""
        return self.register_with_name(target.__name__)(target)

    def register_with_name(self, name: str):
        def decorator(target):
            if not callable(target):
                raise ValueError(f"registry {self._name}: {target!r} is not callable")
            self[name] = target
            return target

        return decorator

    def __getitem__(self, key: str):
        try:
            return super().__getitem__(key)
        except KeyError:
            raise KeyError(
                f"{key!r} not found in registry {self._name!r}; "
                f"available: {sorted(self.keys())}"
            ) from None


class Registers:
    """Global registries (reference `Register.py:41-46`)."""

    runners = Register("runners")
    datasets = Register("datasets")


def get_runner(runner_name: str, config):
    """Instantiate a registered runner by name (reference `utils.py:44-46`)."""
    # Import for registration side effects.
    from bbdm_tpu import runners as _runners  # noqa: F401

    return Registers.runners[runner_name](config)
