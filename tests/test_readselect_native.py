"""
Differential test: read selection through the native C-extension priority
queue (native/pqext.cpp) must select exactly the same reads as with the
pure-Python heap — the heap's unstable tie behavior is part of the output
contract, so the layouts must match operation for operation.
"""

import pytest

from whatshap_tpu import priorityqueue as pq_mod
from whatshap_tpu.parallel import blocks as blk


@pytest.mark.skipif(pq_mod._pqext is None, reason="native pqext unavailable")
@pytest.mark.parametrize("seed,bridging", [(1, True), (2, False), (3, True)])
def test_selection_identical(seed, bridging):
    import whatshap_tpu.readselect as rsel

    rs, positions, _ = blk.make_synthetic_readset(400, 25, read_len=10, seed=seed)

    native_cls = pq_mod._PriorityQueueNative
    python_cls = pq_mod._PriorityQueuePython

    rsel.PriorityQueue = native_cls
    sel_native = rsel.readselection(rs, 12, None, bridging)
    rsel.PriorityQueue = python_cls
    sel_python = rsel.readselection(rs, 12, None, bridging)
    rsel.PriorityQueue = pq_mod.PriorityQueue
    assert sel_native == sel_python


@pytest.mark.skipif(pq_mod._pqext is None, reason="native pqext unavailable")
def test_heap_layout_identical():
    # drive both heaps through an identical op sequence incl. ties and
    # change_score; every pop must agree
    import random

    rng = random.Random(77)
    a = pq_mod._PriorityQueueNative()
    b = pq_mod._PriorityQueuePython()
    live = []
    for i in range(2000):
        score = (rng.randint(0, 5), rng.randint(0, 5), rng.randint(0, 3))
        a.c_push(score, i)
        b.c_push(score, i)
        live.append(i)
    for _ in range(1500):
        op = rng.random()
        if op < 0.4 and live:
            item = rng.choice(live)
            ns = (rng.randint(0, 5), rng.randint(0, 5), rng.randint(0, 3))
            if a.c_get_score_by_item(item) is not None:
                a.c_change_score(item, ns)
                b.c_change_score(item, ns)
        else:
            if a.c_is_empty():
                assert b.c_is_empty()
                break
            ra = a.c_pop()
            rb = b.c_pop()
            assert ra == rb
            if ra[1] in live:
                live.remove(ra[1])
    while not a.c_is_empty():
        assert a.c_pop() == b.c_pop()
    assert b.c_is_empty()
