"""LRU cache + joint-value hashing (trajopt_common_cache_tests analog)."""

import numpy as np
import pytest

from trajopt_tpu.utils.cache import LRUCache, joint_hash


def test_lru_eviction_order():
    c = LRUCache(capacity=2)
    c.put("a", 1)
    c.put("b", 2)
    c.put("c", 3)  # evicts a
    assert "a" not in c and c.get("b") == 2 and c.get("c") == 3
    assert len(c) == 2


def test_get_refreshes_recency():
    c = LRUCache(capacity=2)
    c.put("a", 1)
    c.put("b", 2)
    assert c.get("a") == 1  # a becomes most recent
    c.put("c", 3)           # evicts b
    assert "b" not in c and "a" in c


def test_put_existing_updates_and_refreshes():
    c = LRUCache(capacity=2)
    c.put("a", 1)
    c.put("b", 2)
    c.put("a", 10)
    c.put("c", 3)  # evicts b, not a
    assert c.get("a") == 10 and "b" not in c


def test_get_or_acquire_counts():
    c = LRUCache(capacity=2)
    calls = []

    def make():
        calls.append(1)
        return 42

    assert c.get_or_acquire("k", make) == 42
    assert c.get_or_acquire("k", make) == 42
    assert len(calls) == 1
    assert c.hits == 1 and c.misses == 1


def test_capacity_validation():
    with pytest.raises(ValueError):
        LRUCache(0)


def test_joint_hash_stability_and_discrimination():
    x = np.array([0.1, -0.2, 0.3])
    assert joint_hash(x) == joint_hash(x + 1e-13)   # rounding absorbs noise
    assert joint_hash(x) != joint_hash(x + 1e-6)
    assert joint_hash(x) != joint_hash(x.reshape(1, 3))  # shape-sensitive


def test_reference_solver_uses_cache():
    """The host driver's exact-eval cache hits on trust-loop re-evaluations
    (the GetContactResultCached role)."""
    import jax.numpy as jnp

    from trajopt_tpu.sqp import reference_solver as rs
    from trajopt_tpu.sqp.nlp import Kind, Nlp, TermSet

    nlp = Nlp(n=2, term_sets=(
        TermSet(name="quad", kind=Kind.COST_SQ,
                fn=lambda x, p: x - jnp.asarray([1.0, -1.0]), n_rows=2),
        TermSet(name="sum", kind=Kind.CNT_INEQ,
                fn=lambda x, p: jnp.sum(x)[None] - 1.0, n_rows=1),
    ))
    res = rs.solve_reference(nlp, np.zeros(2), np.full(2, -5.0),
                             np.full(2, 5.0))
    assert res.status == 1
    np.testing.assert_allclose(res.x, [1.0, -1.0], atol=1e-4)
