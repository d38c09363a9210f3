"""utils/stream.py lookahead: dispatch i+1 strictly before consume i, with
results in item order — the overlap contract the eval loops and the L1
inference drivers rely on."""

from or4d_tpu.utils.stream import lookahead


def test_lookahead_order_and_overlap():
    log = []

    def dispatch(x):
        log.append(f"d{x}")
        return x

    def consume(x):
        log.append(f"c{x}")
        return x * 10

    assert lookahead([1, 2, 3], dispatch, consume) == [10, 20, 30]
    # item 2 is dispatched BEFORE item 1 is consumed (the whole point), and
    # consumption stays in item order
    assert log == ["d1", "d2", "c1", "d3", "c2", "c3"]


def test_lookahead_edge_counts():
    assert lookahead([], lambda x: x, lambda x: x) == []
    assert lookahead([7], lambda x: x + 1, lambda x: x * 2) == [16]
