"""Unit contract of the deferred-drain window used by the inference loops
(eval/test_loop._DrainQueue) and mirrored by the Solver's metric pipeline:
FIFO order, bounded in-flight depth, complete flush."""

from istnet_tpu.eval.test_loop import _DrainQueue


def test_drain_queue_fifo_depth_and_flush():
    drained = []
    dq = _DrainQueue(depth=2)
    for i in range(5):
        dq.push(lambda i=i: drained.append(i))
        # never more than `depth` closures left undrained
        assert len(dq._q) <= 2
    # 5 pushed, window holds the last 2
    assert drained == [0, 1, 2]
    dq.flush()
    assert drained == [0, 1, 2, 3, 4]
    dq.flush()  # idempotent
    assert drained == [0, 1, 2, 3, 4]


def test_drain_queue_depth_zero_is_synchronous():
    drained = []
    dq = _DrainQueue(depth=0)
    dq.push(lambda: drained.append("a"))
    assert drained == ["a"]
