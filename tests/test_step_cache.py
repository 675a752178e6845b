"""StepCache LRU semantics (the r5 leak fix's bounding mechanism).

Each live compiled step retains ~1-1.2 GB of host memory (ROADMAP r5 leak
diagnosis); the adaptive-caps/slot-pool ladders mint new capacity tuples
for the whole run, so the per-capacity step caches must be LRU-bounded
(TPU.STEP_CACHE_SIZE) or host RSS grows without bound.  No reference
equivalent (torch recompiles nothing); this pins the eviction mechanics.
"""

from fusiontransformer_tpu.modules.steps import StepCache


def test_evicts_least_recently_used():
    c = StepCache(maxsize=3)
    for k in "abc":
        c[k] = k.upper()
    assert len(c) == 3
    c["d"] = "D"                       # evicts "a"
    assert c.get("a") is None
    assert [k for k in c] == ["b", "c", "d"]


def test_get_refreshes_recency():
    c = StepCache(maxsize=2)
    c["a"] = 1
    c["b"] = 2
    assert c.get("a") == 1             # "a" becomes most-recent
    c["c"] = 3                         # evicts "b", not "a"
    assert c.get("b") is None
    assert c.get("a") == 1 and c.get("c") == 3


def test_reset_moves_to_end():
    c = StepCache(maxsize=2)
    c["a"] = 1
    c["b"] = 2
    c["a"] = 10                        # overwrite refreshes recency too
    c["c"] = 3                         # evicts "b"
    assert c.get("b") is None
    assert c.get("a") == 10


def test_nonpositive_maxsize_disables_eviction():
    c = StepCache(maxsize=0)
    for i in range(64):
        c[i] = i
    assert len(c) == 64


def test_trainer_honors_step_cache_size_cfg():
    from fusiontransformer_tpu.config.defaults import get_default_cfg
    cfg = get_default_cfg()
    assert "STEP_CACHE_SIZE" in cfg.TPU and int(cfg.TPU.STEP_CACHE_SIZE) > 0
