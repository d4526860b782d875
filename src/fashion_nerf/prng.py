"""PRNG key hygiene (SURVEY.md §5.2): JAX's functional model makes data races
inexpressible; the residual risk is KEY REUSE. KeyChain enforces the
threading convention — every draw splits, a key can never be consumed twice.
"""

from __future__ import annotations

import jax


class KeyReuseError(RuntimeError):
    pass


class KeyChain:
    """Single-use key dispenser.

    chain = KeyChain(jax.random.PRNGKey(0))
    k1 = chain.next("stratified")   # fresh subkey every call
    Consuming the chain after .freeze() (or double-freeing a subkey via
    .once) raises KeyReuseError instead of silently correlating samples.
    """

    def __init__(self, key):
        self._key = key
        self._frozen = False
        self._used_labels: set = set()

    def next(self, label: str = ""):
        if self._frozen:
            raise KeyReuseError("KeyChain is frozen — key would be reused")
        self._key, sub = jax.random.split(self._key)
        return sub

    def once(self, label: str):
        """Like next(), but each label may only be drawn a single time —
        catches copy-paste reuse of the same named draw inside one step."""
        if label in self._used_labels:
            raise KeyReuseError(f"key label {label!r} drawn twice")
        self._used_labels.add(label)
        return self.next(label)

    def freeze(self):
        self._frozen = True

    def fork(self) -> "KeyChain":
        return KeyChain(self.next("fork"))
