"""O10 dashboard: board state machine + renderer + painter stream contract
(reference main.py:55-94 — two panels, 4 Hz live refresh)."""

import io

from poc_juma_etl_spark.dashboard import (
    DONE,
    FAILED,
    PENDING,
    RUNNING,
    LivePainter,
    StatusBoard,
    render,
)


def test_board_transitions_and_finished():
    b = StatusBoard(["lineitem", "orders"], ["vw_pricing"])
    assert not b.finished()
    b.mark("lineitem", RUNNING)
    b.mark("orders", RUNNING)
    b.mark("lineitem", DONE)
    assert not b.finished()
    b.mark("orders", FAILED)
    b.mark("vw_pricing", DONE)
    assert b.finished()
    raw, gold, elapsed, wall = b.snapshot()
    assert raw == {"lineitem": DONE, "orders": FAILED}
    assert gold == {"vw_pricing": DONE}
    assert "lineitem" in elapsed and wall >= 0


def test_render_two_panels_sorted():
    b = StatusBoard(["orders", "lineitem"], ["vw_pricing"])
    b.mark("orders", RUNNING)
    frame = render(b)
    assert "RAW" in frame and "GOLD" in frame
    # sorted layout: lineitem line precedes orders line
    assert frame.index("lineitem") < frame.index("orders")
    assert "running" in frame and "pending" in frame
    assert "0/3 done" in frame


def test_painter_non_tty_emits_single_final_frame():
    b = StatusBoard(["t1"], [])
    out = io.StringIO()  # not a TTY → no escape codes, one frame at exit
    with LivePainter(b, stream=out):
        b.mark("t1", RUNNING)
        b.mark("t1", DONE)
    text = out.getvalue()
    assert "\x1b[" not in text
    assert text.count("RAW") == 1
    assert "✔ t1" in text and "1/1 done" in text


class _FakeTty(io.StringIO):
    def isatty(self):
        return True


def test_painter_tty_repaints_with_ansi():
    import time

    b = StatusBoard(["t1"], [])
    out = _FakeTty()
    with LivePainter(b, stream=out):
        b.mark("t1", RUNNING)
        time.sleep(0.6)  # > 2 refresh intervals at 4 Hz
        b.mark("t1", DONE)
        time.sleep(0.3)
    text = out.getvalue()
    # live repaint: multiple frames, cursor-up rewrites between them, and
    # the final frame shows the terminal state
    assert text.count("RAW") >= 2
    assert "\x1b[" in text
    assert "✔ t1" in text
