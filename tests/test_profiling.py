"""parse_trace / aggregate_ops: device-plane attribution from a trace file."""

import gzip
import json
import os

from istnet_tpu.utils import profiling


def _write_trace(tmp_path) -> str:
    events = [
        {"ph": "M", "pid": 3, "name": "process_name",
         "args": {"name": "/device:TPU:0"}},
        {"ph": "M", "pid": 3, "tid": 3, "name": "thread_name",
         "args": {"name": "XLA Ops"}},
        {"ph": "M", "pid": 3, "tid": 2, "name": "thread_name",
         "args": {"name": "XLA Modules"}},
        {"ph": "M", "pid": 701, "name": "process_name",
         "args": {"name": "/host:CPU"}},
        # two calls of the same op + one other op on the device ops thread
        {"ph": "X", "pid": 3, "tid": 3, "name": "fusion", "dur": 100.0,
         "args": {"hlo_category": "convolution fusion",
                  "tf_op": "jit(f)/conv", "model_flops": "1000000",
                  "bytes_accessed": "2048", "source_stack": "x.py:1\ny.py:2"}},
        {"ph": "X", "pid": 3, "tid": 3, "name": "fusion", "dur": 100.0,
         "args": {"hlo_category": "convolution fusion",
                  "tf_op": "jit(f)/conv", "model_flops": "1000000",
                  "bytes_accessed": "2048"}},
        {"ph": "X", "pid": 3, "tid": 3, "name": "gather.1", "dur": 50.0,
         "args": {"tf_op": "jit(f)/gather", "bytes_accessed": "4096"}},
        # module-thread and host events must be ignored
        {"ph": "X", "pid": 3, "tid": 2, "name": "jit_f", "dur": 999.0},
        {"ph": "X", "pid": 701, "tid": 1, "name": "PjitFunction", "dur": 999.0},
    ]
    d = os.path.join(tmp_path, "plugins", "profile", "run1")
    os.makedirs(d)
    with gzip.open(os.path.join(d, "host.trace.json.gz"), "wt") as f:
        json.dump({"traceEvents": events}, f)
    return str(tmp_path)


def test_parse_trace_device_ops_only(tmp_path):
    rows = profiling.parse_trace(_write_trace(tmp_path))
    assert len(rows) == 3
    assert {r["name"] for r in rows} == {"fusion", "gather.1"}
    assert all(r["dur_us"] in (100.0, 50.0) for r in rows)


def test_aggregate_ops_by_tf_op(tmp_path):
    rows = profiling.parse_trace(_write_trace(tmp_path))
    agg = profiling.aggregate_ops(rows, key="tf_op", calls=2)
    assert agg[0]["key"] == "jit(f)/conv"
    assert agg[0]["dur_us"] == 100.0  # 200 total / 2 calls
    assert agg[0]["n"] == 1
    # 2 MFLOP over 2 calls in 100 us -> 0.01 TF/s, rounded to 0.0
    assert agg[0]["tflops"] == 0.0
    assert agg[1]["key"] == "jit(f)/gather"
    assert agg[1]["dur_us"] == 25.0
