"""TUI key routing + rendering logic (≙ events.rs / ui.rs), curses-free."""

from pathlib import Path

import pytest

from sema_tpu.search.engine import Engine
from sema_tpu.tui import events as ev
from sema_tpu.tui import render as rd
from sema_tpu.types import Chunk, SearchResult, UIMode, AppState


def results(n, path_fmt="f{}.py"):
    return [SearchResult(
        chunk=Chunk(id=f"{i}", file_path=Path(path_fmt.format(i)),
                    start_line=i * 10 + 1, end_line=i * 10 + 5,
                    content="c"), score=1.0 - i * 0.01)
        for i in range(n)]


def ready_engine(n=5):
    eng = Engine()
    eng.state = AppState.READY
    eng.search_results = results(n)
    eng.ui_mode = UIMode.SEARCH_RESULTS
    return eng


# -- input state (≙ tui_input) -------------------------------------------------

def test_input_state_editing():
    s = ev.InputState()
    for ch in "abc":
        s.insert(ch)
    s.left(); s.insert("X")
    assert s.text == "abXc" and s.cursor == 3
    s.backspace()
    assert s.text == "abc" and s.cursor == 2
    s.home(); s.delete()
    assert s.text == "bc" and s.cursor == 0
    s.end()
    assert s.cursor == 2


# -- key routing -----------------------------------------------------------------

def test_results_per_page():
    # (h-5)/3: matches the renderer's visible rows (body h-3, borders 2)
    # — the reference's (h-2)/3 frame math scrolled the selection out of
    # the rendered window in THIS layout (review finding, r3)
    assert ev.results_per_page(32) == 9
    assert ev.results_per_page(2) == 1     # min 1 (events.rs:26)


def test_enter_in_input_executes_search():
    eng = ready_engine()
    eng.ui_mode = UIMode.SEARCH_INPUT
    inp = ev.InputState(text="hello", cursor=5)
    assert ev.handle_key_ready(ev.KEY_ENTER, eng, inp, 30) is \
        ev.EventResult.EXECUTE_SEARCH


def test_enter_empty_input_continues():
    eng = ready_engine()
    eng.ui_mode = UIMode.SEARCH_INPUT
    inp = ev.InputState(text="   ", cursor=3)
    assert ev.handle_key_ready(ev.KEY_ENTER, eng, inp, 30) is \
        ev.EventResult.CONTINUE


def test_enter_in_results_opens_file():
    eng = ready_engine()
    assert ev.handle_key_ready(ev.KEY_ENTER, eng, ev.InputState(), 30) is \
        ev.EventResult.OPEN_FILE


def test_esc_walks_back_modes():
    eng = ready_engine()
    eng.ui_mode = UIMode.FILE_PREVIEW
    ev.handle_key_ready(ev.KEY_ESC, eng, ev.InputState(), 30)
    assert eng.ui_mode is UIMode.SEARCH_RESULTS
    ev.handle_key_ready(ev.KEY_ESC, eng, ev.InputState(), 30)
    assert eng.ui_mode is UIMode.SEARCH_INPUT
    # in input mode Esc clears (ExecuteSearch with empty text)
    inp = ev.InputState(text="abc", cursor=3)
    assert ev.handle_key_ready(ev.KEY_ESC, eng, inp, 30) is \
        ev.EventResult.EXECUTE_SEARCH
    assert inp.text == ""


def test_tab_cycles_only_with_results():
    eng = ready_engine()
    eng.ui_mode = UIMode.SEARCH_INPUT
    ev.handle_key_ready(ev.KEY_TAB, eng, ev.InputState(), 30)
    assert eng.ui_mode is UIMode.SEARCH_RESULTS
    ev.handle_key_ready(ev.KEY_TAB, eng, ev.InputState(), 30)
    assert eng.ui_mode is UIMode.FILE_PREVIEW
    ev.handle_key_ready(ev.KEY_TAB, eng, ev.InputState(), 30)
    assert eng.ui_mode is UIMode.SEARCH_INPUT

    empty = Engine()
    empty.state = AppState.READY
    empty.ui_mode = UIMode.SEARCH_INPUT
    ev.handle_key_ready(ev.KEY_TAB, empty, ev.InputState(), 30)
    assert empty.ui_mode is UIMode.SEARCH_INPUT  # events.rs:60-69


def test_navigation_and_scroll_clamping():
    eng = ready_engine(20)
    # page = (11-5)/3 = 2 rows visible (renderer geometry)
    for _ in range(5):
        ev.handle_key_ready(ev.KEY_DOWN, eng, ev.InputState(), 11)
    assert eng.selected_search_result == 5
    assert eng.search_results_scroll_offset == 4  # sel - visible + 1
    ev.handle_key_ready(ev.KEY_PGUP, eng, ev.InputState(), 11)
    assert eng.selected_search_result == 3
    ev.handle_key_ready(ev.KEY_PGDN, eng, ev.InputState(), 11)
    assert eng.selected_search_result == 5
    # up beyond 0 clamps
    eng.selected_search_result = 0
    ev.handle_key_ready(ev.KEY_UP, eng, ev.InputState(), 11)
    assert eng.selected_search_result == 0


def test_preview_scrolling():
    eng = ready_engine()
    eng.ui_mode = UIMode.FILE_PREVIEW
    ev.handle_key_ready(ev.KEY_DOWN, eng, ev.InputState(), 30)
    assert eng.file_preview_scroll_offset == 1
    ev.handle_key_ready(ev.KEY_PGDN, eng, ev.InputState(), 30)
    assert eng.file_preview_scroll_offset == 11
    ev.handle_key_ready(ev.KEY_PGUP, eng, ev.InputState(), 30)
    assert eng.file_preview_scroll_offset == 1
    ev.handle_key_ready(ev.KEY_UP, eng, ev.InputState(), 30)
    assert eng.file_preview_scroll_offset == 0


def test_q_quits_outside_input_only():
    """Deviation from events.rs:29 (where q quits even while typing)."""
    eng = ready_engine()
    assert ev.handle_key_ready("q", eng, ev.InputState(), 30) is \
        ev.EventResult.QUIT
    eng.ui_mode = UIMode.SEARCH_INPUT
    inp = ev.InputState()
    assert ev.handle_key_ready("q", eng, inp, 30) is ev.EventResult.CONTINUE
    assert inp.text == "q"


def test_ctrl_c_always_quits():
    eng = ready_engine()
    eng.ui_mode = UIMode.SEARCH_INPUT
    assert ev.handle_key_ready(ev.KEY_CTRL_C, eng, ev.InputState(), 30) is \
        ev.EventResult.QUIT
    assert ev.handle_key_non_ready(ev.KEY_CTRL_C, ev.InputState()) is \
        ev.EventResult.QUIT


def test_non_ready_buffers_typing():
    inp = ev.InputState()
    for ch in "hello":
        ev.handle_key_non_ready(ch, inp)
    assert inp.text == "hello"  # events.rs:176-200


# -- rendering --------------------------------------------------------------------

def test_status_messages_parity():
    title, msg = rd.status_message(AppState.CRAWLING, 0, "")
    assert "Crawling files..." in title and title.startswith(" ⠋")
    title, msg = rd.status_message(AppState.CHUNKING, 1, "")
    assert "Processing files..." in title and "⠙" in title
    title, msg = rd.status_message(AppState.READY, 0, "")
    assert title == " Ready to Search "
    assert "Type your search query" in msg
    _, msg2 = rd.status_message(AppState.READY, 0, "abc")
    assert "refine your query" in msg2


def test_search_box_title():
    assert rd.search_box_title(None, 0, "", UIMode.SEARCH_INPUT) == " Search "
    assert rd.search_box_title("oops", 5, "q", UIMode.SEARCH_INPUT) == \
        " Search - oops "
    assert rd.search_box_title(None, 5, "q", UIMode.SEARCH_INPUT) == \
        " Search - 5 results "
    assert rd.search_box_title(None, 5, "q", UIMode.SEARCH_RESULTS) == " Search "


def test_display_path():
    assert rd.display_path(Path("/root/x/a.py"), Path("/root/x")) == "a.py"
    assert rd.display_path(Path("/other/place/deep/a.py"), Path("/root/x")) \
        == "deep/a.py"
    long = Path("/a/" + "b" * 60 + "/c.py")
    dp = rd.display_path(long, Path("/root/x"))
    assert dp.startswith("...") and len(dp) == 50


def test_result_rows_badge_and_range():
    rs = results(2)
    rs[0].total_matches_in_file = 3
    rows = rd.result_rows(rs, selected=1, scroll_offset=0, width=40,
                          height=9, base_dir=Path("."))
    assert len(rows) == 6  # 2 results × 3 lines
    # row 0: path, bold (not selected)
    assert rows[0][0] == ("f0.py", rd.S_BOLD)
    # badge on first result
    assert rows[1][0] == ("+3", rd.S_BADGE)
    assert rows[1][-1][0] == "L1-5"
    # selected styling on second result
    assert rows[3][0][1] == rd.S_SELECTED


def test_merge_term_matches_overlap():
    # ui.rs:524-570 overlap merge
    assert rd.merge_term_matches("abcabc", ["abc", "bca"]) == [(0, 6)]
    assert rd.merge_term_matches("xx abc yy", ["abc"]) == [(3, 6)]
    assert rd.merge_term_matches("ABC", ["abc"]) == [(0, 3)]


def test_highlight_terms_splits_spans():
    spans = [("the quick fox", rd.S_DEFAULT)]
    out = rd.highlight_terms(spans, ["quick"])
    assert out == [("the ", rd.S_DEFAULT), ("quick", rd.S_MATCH),
                   (" fox", rd.S_DEFAULT)]


def test_preview_lines_numbers_and_scroll():
    content = "\n".join(f"line{i}" for i in range(1, 21)) + "\n"
    lines = rd.preview_lines(content, Path("f.txt"), scroll_offset=4,
                             visible_lines=3, search_query="hello")
    assert len(lines) == 3
    assert lines[0][0][0].strip().startswith("5")  # 1-based numbering
    # semantic query → no term highlighting
    assert all(tag != rd.S_MATCH for line in lines for _, tag in line)


def test_preview_lines_keyword_highlight():
    lines = rd.preview_lines("foo bar baz\n", Path("f.txt"), 0, 10, "'bar")
    flat = [(t, s) for line in lines for t, s in line]
    assert ("bar", rd.S_MATCH) in flat


def test_preview_highlight_skips_operators_and_exclusions():
    """Operator queries highlight only the positive parsed terms: the
    AND keyword, +/- prefixes, and excluded clauses are never painted."""
    lines = rd.preview_lines("foo AND bar and baz\n", Path("f.txt"),
                             0, 10, "'+foo AND bar -baz")
    flat = [(t, s) for line in lines for t, s in line]
    assert ("foo", rd.S_MATCH) in flat
    assert ("bar", rd.S_MATCH) in flat
    assert all(s != rd.S_MATCH or t.lower() != "baz" for t, s in flat)
    # the literal AND in the content is not a highlighted term
    assert all(s != rd.S_MATCH or t != "AND" for t, s in flat)


def test_preview_empty_file():
    lines = rd.preview_lines("", Path("f.txt"), 0, 10, "")
    assert lines == [[("  1 │ (empty file)", rd.S_DIM)]]


def test_preview_scroll_clamped():
    lines = rd.preview_lines("one\ntwo\n", Path("f.txt"), 999, 10, "")
    assert len(lines) == 1
    assert "two" in "".join(t for t, _ in lines[0])


def test_wrap_spans():
    spans = [("0123456789", rd.S_DEFAULT), ("abcde", rd.S_KW)]
    rows = rd.wrap_spans(spans, 6)
    assert rows == [[("012345", rd.S_DEFAULT)],
                    [("6789", rd.S_DEFAULT), ("ab", rd.S_KW)],
                    [("cde", rd.S_KW)]]
    # width larger than content → single row, styles preserved
    assert rd.wrap_spans(spans, 99) == [spans]


# -- mouse routing (improvement over app.rs:150-158's refocus-only) -----------

class TestMouse:
    W, H = 100, 32  # body_h = 29, left_w = 30

    def test_click_selects_result_row(self):
        eng = ready_engine(8)
        # row i occupies 3 lines starting at y = 1 + 3*i
        changed = ev.handle_mouse(eng, x=5, y=1 + 3 * 2, width=self.W,
                                  height=self.H)
        assert changed and eng.selected_search_result == 2
        assert eng.ui_mode is UIMode.SEARCH_RESULTS

    def test_click_respects_scroll_offset(self):
        eng = ready_engine(30)
        eng.search_results_scroll_offset = 10
        changed = ev.handle_mouse(eng, x=5, y=4, width=self.W, height=self.H)
        assert changed and eng.selected_search_result == 11

    def test_click_preview_focuses_preview(self):
        eng = ready_engine(5)
        changed = ev.handle_mouse(eng, x=60, y=5, width=self.W, height=self.H)
        assert not changed
        assert eng.ui_mode is UIMode.FILE_PREVIEW

    def test_click_search_box_focuses_input(self):
        eng = ready_engine(5)
        changed = ev.handle_mouse(eng, x=5, y=self.H - 2, width=self.W,
                                  height=self.H)
        assert not changed
        assert eng.ui_mode is UIMode.SEARCH_INPUT

    def test_click_same_row_no_resync(self):
        eng = ready_engine(5)
        eng.selected_search_result = 0
        assert not ev.handle_mouse(eng, x=5, y=1, width=self.W, height=self.H)

    def test_click_past_results_clamps(self):
        eng = ready_engine(2)
        assert not ev.handle_mouse(eng, x=5, y=25, width=self.W,
                                   height=self.H)
        assert eng.selected_search_result == 0

    def test_click_ignored_when_not_ready(self):
        eng = Engine()
        eng.state = AppState.CRAWLING
        assert not ev.handle_mouse(eng, x=5, y=4, width=self.W, height=self.H)

    def test_click_without_split_refocuses_input(self):
        eng = ready_engine(5)
        eng.ui_mode = UIMode.SEARCH_INPUT   # no split shown
        assert not ev.handle_mouse(eng, x=5, y=4, width=self.W, height=self.H)
        assert eng.ui_mode is UIMode.SEARCH_INPUT


# -- incremental search (opt-in extension; ref searches only on Enter) --------

class FakeClock:
    def __init__(self):
        self.t = 0.0

    def __call__(self):
        return self.t


class TestIncrementalSearch:
    def make(self, debounce_ms=300):
        clk = FakeClock()
        return ev.IncrementalSearch(debounce_ms, clock=clk), clk

    def test_fires_after_debounce(self):
        inc, clk = self.make()
        inc.on_edit("quick")
        assert inc.poll() is None          # too soon
        clk.t = 0.31
        assert inc.poll() == "quick"
        assert inc.poll() is None          # fires once

    def test_keystrokes_reset_window(self):
        inc, clk = self.make()
        inc.on_edit("qu")
        clk.t = 0.2
        inc.on_edit("qui")                 # edit during window resets it
        clk.t = 0.4
        assert inc.poll() is None          # only 0.2s since last edit
        clk.t = 0.61
        assert inc.poll() == "qui"

    def test_enter_suppresses_refire(self):
        inc, clk = self.make()
        inc.on_edit("query text")
        inc.searched("query text")         # user hit Enter first
        clk.t = 1.0
        assert inc.poll() is None

    def test_same_text_not_rescheduled(self):
        inc, clk = self.make()
        inc.on_edit("abc")
        clk.t = 0.31
        assert inc.poll() == "abc"
        clk.t = 1.0
        inc.on_edit("abc")                 # e.g. arrow keys, no text change
        clk.t = 2.0
        assert inc.poll() is None

    def test_edit_after_run_fires_again(self):
        inc, clk = self.make()
        inc.on_edit("abc")
        clk.t = 0.31
        assert inc.poll() == "abc"
        inc.on_edit("abcd")
        clk.t = 0.62
        assert inc.poll() == "abcd"


def test_app_query_gate_counts_utf8_bytes(tmp_path):
    """app.rs:165 gates on query.trim().len() — UTF-8 BYTES: a 2-char CJK
    query (6 bytes) must run, a 2-char ASCII query must clear."""
    from pathlib import Path
    from sema_tpu.config import Config
    from sema_tpu.tui.app import TuiApp

    app = TuiApp(Path(str(tmp_path)), Config())
    ran = []
    app.engine.execute_search = lambda q, limit=50: ran.append(q)
    cleared = []
    app.engine.clear_search = lambda: cleared.append(True)

    app.execute_search("ab")          # 2 bytes -> cleared
    assert cleared and not ran
    app.execute_search("日本")        # 2 chars, 6 bytes -> runs
    assert ran == ["日本"]


# -- preview wrap toggle + horizontal scroll (extension over ui.rs:260) -------

class TestPreviewWrapToggle:
    def test_w_toggles_and_resets_hscroll(self):
        eng = ready_engine(3)
        eng.ui_mode = UIMode.FILE_PREVIEW
        eng.preview_wrap = False
        eng.file_preview_hscroll = 24
        ev.handle_key_ready("w", eng, ev.InputState(), 30)
        assert eng.preview_wrap and eng.file_preview_hscroll == 0
        ev.handle_key_ready("w", eng, ev.InputState(), 30)
        assert not eng.preview_wrap

    def test_arrows_scroll_only_when_unwrapped(self):
        eng = ready_engine(3)
        eng.ui_mode = UIMode.FILE_PREVIEW
        ev.handle_key_ready(ev.KEY_RIGHT, eng, ev.InputState(), 30)
        assert eng.file_preview_hscroll == 0      # wrap on: ignored
        eng.preview_wrap = False
        ev.handle_key_ready(ev.KEY_RIGHT, eng, ev.InputState(), 30)
        ev.handle_key_ready(ev.KEY_RIGHT, eng, ev.InputState(), 30)
        assert eng.file_preview_hscroll == 16
        ev.handle_key_ready(ev.KEY_LEFT, eng, ev.InputState(), 30)
        ev.handle_key_ready(ev.KEY_LEFT, eng, ev.InputState(), 30)
        ev.handle_key_ready(ev.KEY_LEFT, eng, ev.InputState(), 30)
        assert eng.file_preview_hscroll == 0      # clamped

    def test_w_in_input_mode_types(self):
        eng = ready_engine(3)
        eng.ui_mode = UIMode.SEARCH_INPUT
        inp = ev.InputState()
        ev.handle_key_ready("w", eng, inp, 30)
        assert inp.text == "w" and eng.preview_wrap

    def test_file_change_resets_hscroll(self, tmp_path):
        f = tmp_path / "x.txt"
        f.write_text("hello")
        eng = ready_engine(2)
        eng.file_preview_hscroll = 40
        eng.update_current_file_content(f)
        assert eng.file_preview_hscroll == 0


def test_drop_cols_preserves_styles():
    spans = [("abc", rd.S_DIM), ("defg", rd.S_KW)]
    assert rd.drop_cols(spans, 0) == spans
    assert rd.drop_cols(spans, 2) == [("c", rd.S_DIM), ("defg", rd.S_KW)]
    assert rd.drop_cols(spans, 3) == [("defg", rd.S_KW)]
    assert rd.drop_cols(spans, 5) == [("fg", rd.S_KW)]
    assert rd.drop_cols(spans, 99) == []


def test_preview_lines_hscroll_keeps_gutter(tmp_path):
    lines = rd.preview_lines("abcdefghij\nklm", Path("f.txt"), 0, 5, "",
                             hscroll=4)
    # gutter prefix intact, content shifted
    text0 = "".join(t for t, _ in lines[0])
    assert text0.startswith("  1 │ ")
    assert text0.endswith("efghij")
    text1 = "".join(t for t, _ in lines[1])
    assert text1 == "  2 │ "            # short line fully scrolled off


def test_click_past_rendered_page_ignored():
    """Review finding: only (body_h-2)//3 full result rows render; a
    click on the partial band below them must not select an invisible
    result. height=13 -> body_h=10, inner height 8 -> 2 rendered rows
    (y=1..6); y=7..8 is the partial band."""
    eng = ready_engine(30)
    eng.search_results_scroll_offset = 0
    assert not ev.handle_mouse(eng, x=5, y=7, width=100, height=13)
    assert eng.selected_search_result == 0
    assert not ev.handle_mouse(eng, x=5, y=8, width=100, height=13)
    assert eng.selected_search_result == 0
    # y=4 (row 1) is rendered and selects
    assert ev.handle_mouse(eng, x=5, y=4, width=100, height=13)
    assert eng.selected_search_result == 1
