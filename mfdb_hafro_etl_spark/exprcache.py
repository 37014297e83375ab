"""Process-scoped memo for unresolved Column expression templates.

Building a Column tree costs one py4j round-trip per operator
(~0.2-0.7 ms on a virtualized host), and the suite's expression-heavy
builders (minhash digests, KN n-gram algebra, correction overlays)
re-build identical trees for every query that uses them — measured
tens of thousands of round-trips across one 141-arm bench run
(tools/construction_census.py / py4j_hotspots.py, r12).

An UNRESOLVED Column is an immutable template: analysis never mutates
the tree (Catalyst resolution produces new trees), so handing every
caller the same object is semantically identical to rebuilding it.
Two wins: the py4j construction cost is paid once per process instead
of once per query, and higher-order-function lambda variables keep
the names minted at construction — identical plans then hit the JVM
codegen class cache instead of re-compiling (the shingles() docstring
documents the cost of fresh lambda names).

Scope and safety:
- Cache keys are the builder's positional/keyword args, which must be
  hashable and must FULLY determine the returned tree. Builders that
  close over a DataFrame or other per-plan state must not be wrapped.
- The cached JavaObjects live as long as the py4j gateway — which
  PySpark keeps for the Python process lifetime (sessions may stop
  and restart; the JVM gateway survives). Expression trees are a few
  hundred bytes each; the pinned set is bounded by the distinct
  parameterizations, not by data.
- Callers must treat returned lists/tuples as immutable (they are
  returned as tuples to make accidental mutation loud).
"""

from __future__ import annotations

import functools

_MEMO: dict = {}


def column_template(fn):
    """Memoize a pure ``(*hashable) -> Column | tuple[Column, ...]``
    template builder per process. Lists are normalized to tuples so a
    caller can't mutate the shared value in place."""

    @functools.wraps(fn)
    def wrapped(*args, **kwargs):
        key = (fn.__module__, fn.__qualname__, args, tuple(sorted(kwargs.items())))
        try:
            hit = _MEMO.get(key)
        except TypeError:  # unhashable arg — build fresh, don't cache
            return fn(*args, **kwargs)
        if hit is None:
            hit = fn(*args, **kwargs)
            if isinstance(hit, list):
                hit = tuple(hit)
            _MEMO[key] = hit
        return hit

    return wrapped
