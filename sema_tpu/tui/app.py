"""Curses application loop (≙ reference src/tui/app.rs).

Parity:

- startup sequence crawl → index inline before the event loop, with the
  status screen redrawn between states (app.rs:72-86). Indexing runs on the
  MAIN thread here — dispatching JAX work from a short-lived secondary
  thread can wedge the device (see docs/PERF.md) — with pump callbacks from
  the pipeline driving spinner redraws, so the spinner animates anyway (the
  reference blocks the UI during indexing; its spinner only moves between
  states);
- 100 ms event poll + 100 ms spinner tick (app.rs:23-24, 88-105);
- key routing per tui/events.py; search via Engine; ≤2-char queries clear
  (app.rs:164-168);
- after a search, the first result's file is previewed scrolled to its
  chunk start (app.rs:176-181); selection changes re-sync the preview
  (app.rs:144-146, 202-221); Enter opens the file in preview mode
  (app.rs:184-200);
- mouse left-click focuses the search box (app.rs:150-158);
- alternate screen + cleanup on exit (app.rs:38-54).
"""

from __future__ import annotations

import curses
from pathlib import Path

from sema_tpu.search.engine import Engine
from sema_tpu.tui import events as ev
from sema_tpu.tui import render as rd
from sema_tpu.types import AppState, UIMode

POLL_INTERVAL_MS = 100  # app.rs:23-24

_STYLE_ATTRS = {}


def _init_styles():
    try:
        curses.start_color()
        curses.use_default_colors()
    except curses.error:
        # no color capability (TERM=vt100 etc.): degrade to monochrome
        # instead of crashing at startup — init_pair below fails into
        # attr 0 the same way
        pass
    pairs = {
        "blue": (curses.COLOR_BLUE, -1),
        "red": (curses.COLOR_RED, -1),
        "badge": (curses.COLOR_YELLOW, -1),
        "selected": (curses.COLOR_WHITE, curses.COLOR_BLUE),
        "match": (curses.COLOR_BLACK, curses.COLOR_YELLOW),
        "kw": (curses.COLOR_MAGENTA, -1),
        "str": (curses.COLOR_GREEN, -1),
        "com": (curses.COLOR_CYAN, -1),
        "num": (curses.COLOR_CYAN, -1),
        "name": (curses.COLOR_BLUE, -1),
    }
    for i, (name, (fg, bg)) in enumerate(pairs.items(), start=1):
        try:
            curses.init_pair(i, fg, bg)
            _STYLE_ATTRS[name] = curses.color_pair(i)
        except curses.error:
            _STYLE_ATTRS[name] = 0
    _STYLE_ATTRS.update({
        rd.S_DEFAULT: 0,
        rd.S_DIM: curses.A_DIM,
        rd.S_BOLD: curses.A_BOLD,
        rd.S_SELECTED: _STYLE_ATTRS["selected"] | curses.A_BOLD,
        rd.S_BADGE: _STYLE_ATTRS["badge"],
        rd.S_MATCH: _STYLE_ATTRS["match"] | curses.A_BOLD,
        rd.S_KW: _STYLE_ATTRS["kw"],
        rd.S_STR: _STYLE_ATTRS["str"],
        rd.S_COM: _STYLE_ATTRS["com"] | curses.A_DIM,
        rd.S_NUM: _STYLE_ATTRS["num"],
        rd.S_NAME: _STYLE_ATTRS["name"],
    })


def _attr(tag: str) -> int:
    return _STYLE_ATTRS.get(tag, 0)


_KEYMAP = {
    curses.KEY_ENTER: ev.KEY_ENTER, 10: ev.KEY_ENTER, 13: ev.KEY_ENTER,
    27: ev.KEY_ESC, 9: ev.KEY_TAB,
    curses.KEY_UP: ev.KEY_UP, curses.KEY_DOWN: ev.KEY_DOWN,
    curses.KEY_PPAGE: ev.KEY_PGUP, curses.KEY_NPAGE: ev.KEY_PGDN,
    curses.KEY_LEFT: ev.KEY_LEFT, curses.KEY_RIGHT: ev.KEY_RIGHT,
    curses.KEY_HOME: ev.KEY_HOME, curses.KEY_END: ev.KEY_END,
    curses.KEY_BACKSPACE: ev.KEY_BACKSPACE, 127: ev.KEY_BACKSPACE,
    8: ev.KEY_BACKSPACE, curses.KEY_DC: ev.KEY_DELETE,
    3: ev.KEY_CTRL_C,
}


def _translate_key(code: int):
    if code in _KEYMAP:
        return _KEYMAP[code]
    if 32 <= code < 0x110000:
        return chr(code)
    return None


def _read_key(stdscr):
    """One input event via ``get_wch()``: a _KEYMAP name, a printable
    character, ``"mouse"``/``"resize"``, ``"ignore"`` (recognized but
    unmapped — e.g. F-keys), or None (no input within the timeout).

    get_wch (vs getch) delivers multibyte input as WHOLE characters —
    getch returned UTF-8 bytes one at a time, turning the CJK queries
    the byte-length gate explicitly supports into mojibake — and
    unmapped special keycodes are dropped instead of inserted as junk
    ``chr()`` text (review finding, r3)."""
    try:
        wch = stdscr.get_wch()
    except curses.error:
        return None          # timeout / no pending input
    except KeyboardInterrupt:
        return ev.KEY_CTRL_C
    if isinstance(wch, int):
        if wch == curses.KEY_MOUSE:
            return "mouse"
        if wch == curses.KEY_RESIZE:
            return "resize"
        return _KEYMAP.get(wch, "ignore")
    code = ord(wch)
    if code in _KEYMAP:
        return _KEYMAP[code]
    return wch if wch.isprintable() else "ignore"


class TuiApp:
    def __init__(self, directory: Path, config):
        self.directory = directory
        self.config = config
        self.engine = Engine()
        self.input = ev.InputState()
        self.index_error = None
        self._index_thread = None
        tcfg = getattr(config, "tui", None)
        self.incremental = (
            ev.IncrementalSearch(tcfg.incremental_debounce_ms)
            if tcfg is not None and tcfg.incremental_search else None)

    # -- inline index (app.rs:72-86 startup sequence) -------------------------
    #
    # The reference indexes on the main task before the event loop starts;
    # keys pressed during indexing sit in the tty buffer. We do the same
    # (JAX work must stay on the main thread — background-thread dispatch
    # deadlocks on tunneled TPU runtimes), but pump redraws and key
    # buffering from the embed progress callback, so the spinner animates
    # and typing-ahead works (a strict improvement, same sequencing).

    class _QuitDuringIndex(Exception):
        pass

    def _pump(self, stdscr):
        """Advance spinner, redraw, drain buffered keys (non-ready mode)."""
        self.engine.spinner_frame = (self.engine.spinner_frame + 1) % 8
        self.draw(stdscr)
        stdscr.nodelay(True)
        try:
            while True:
                key = _read_key(stdscr)
                if key is None:
                    break
                if key in ("mouse", "resize", "ignore"):
                    continue
                if ev.handle_key_non_ready(key, self.input) is \
                        ev.EventResult.QUIT:
                    raise TuiApp._QuitDuringIndex()
        finally:
            stdscr.nodelay(False)
            stdscr.timeout(POLL_INTERVAL_MS)

    def run_indexing(self, stdscr):
        from sema_tpu.cli import crawler_config, make_index_manager
        from sema_tpu.crawl import FileCrawler

        try:
            self.engine.state = AppState.CRAWLING
            self._pump(stdscr)
            files = FileCrawler(crawler_config(self.config)).crawl_directory(
                self.directory)
            self.engine.state = AppState.CHUNKING
            self._pump(stdscr)
            mgr = make_index_manager(self.config)
            mgr.process_and_index_files(
                files, progress=lambda *_: self._pump(stdscr),
                purge_missing_under=self.directory)
            self.engine.index_manager = mgr
            # warm the query path so the first Enter answers fast (first
            # dispatch pays executable load + param placement)
            try:
                if mgr.vector_store.live_rows:
                    mgr.search("warmup", 1)
            except Exception:  # noqa: BLE001 — warmup is best-effort
                pass
        except TuiApp._QuitDuringIndex:
            raise
        except Exception as e:  # noqa: BLE001
            self.index_error = str(e)
            self.engine.search_error = f"Indexing failed: {e}"
        self.engine.state = AppState.READY

    # -- search actions (app.rs:164-221) --------------------------------------

    def execute_search(self, query: str) -> None:
        # byte length, not chars: the reference gate is query.trim().len()
        # on a Rust &str (UTF-8 bytes), so 1-2 CJK chars pass (app.rs:165)
        if len(query.strip().encode("utf-8")) <= 2:
            self.engine.clear_search()
            return
        self.engine.execute_search(
            query, limit=self.config.index.result_limit)
        if self.engine.search_error is not None:
            # failed search keeps the PREVIOUS results + selection on
            # screen (engine semantics); re-previewing stale result 0
            # here desynced the preview from the highlighted selection
            return
        first = self.engine.search_results[0] if self.engine.search_results else None
        if first is not None:
            self.engine.update_current_file_content(first.chunk.file_path)
            self.engine.file_preview_scroll_offset = max(
                first.chunk.start_line - 1, 0)

    def open_file(self) -> None:
        result = self.engine.selected_result()
        if result is None:
            self.engine.ui_mode = UIMode.FILE_PREVIEW
            return
        self.engine.update_current_file_content(result.chunk.file_path)
        self.engine.file_preview_scroll_offset = max(
            result.chunk.start_line - 1, 0)
        self.engine.ui_mode = UIMode.FILE_PREVIEW

    def sync_file_preview(self) -> None:
        result = self.engine.selected_result()
        if result is None:
            return
        if self.engine.current_file_path != result.chunk.file_path:
            self.engine.update_current_file_content(result.chunk.file_path)
        self.engine.file_preview_scroll_offset = max(
            result.chunk.start_line - 1, 0)

    # -- drawing ----------------------------------------------------------------

    def _box(self, win, y, x, h, w, title: str, focused: bool):
        attr = _attr("red") if focused else curses.A_DIM
        try:
            for i in range(1, h - 1):
                win.addstr(y + i, x, "│", attr)
                win.addstr(y + i, x + w - 1, "│", attr)
            win.addstr(y, x, "╭" + "─" * (w - 2) + "╮", attr)
            win.addstr(y + h - 1, x, "╰" + "─" * (w - 2) + "╯", attr)
            if title:
                win.addstr(y, x + 1, title[:w - 2], curses.A_BOLD)
        except curses.error:
            pass

    def _put_spans(self, win, y, x, spans, max_w):
        col = x
        for text, tag in spans:
            if col - x >= max_w:
                break
            text = text[:max_w - (col - x)]
            try:
                win.addstr(y, col, text, _attr(tag))
            except curses.error:
                pass
            col += len(text)

    def _draw_search_box(self, win, y, w):
        focused = self.engine.ui_mode is UIMode.SEARCH_INPUT
        title = rd.search_box_title(
            self.engine.search_error, len(self.engine.search_results),
            self.input.text, self.engine.ui_mode)
        self._box(win, y, 0, 3, w, title, focused)
        inner_w = max(w - 3, 1)
        scroll = max(self.input.cursor - inner_w + 1, 0)
        visible = self.input.text[scroll:scroll + inner_w]
        try:
            win.addstr(y + 1, 1, visible)
        except curses.error:
            pass
        if focused:
            try:
                curses.curs_set(1)
                win.move(y + 1, 1 + self.input.cursor - scroll)
            except curses.error:
                pass
        else:
            try:
                curses.curs_set(0)
            except curses.error:
                pass

    def draw(self, win):
        win.erase()
        h, w = win.getmaxyx()
        if h < 6 or w < 20:
            try:
                win.addstr(0, 0, "terminal too small")
            except curses.error:
                pass
            win.refresh()
            return

        # Parity: the reference hides the split while typing
        # (ui.rs:40-43 renders the status screen in SearchInput mode even
        # with results). With incremental search on, that would make
        # search-as-you-type invisible — so in that mode the split stays
        # up while the input retains focus (documented deviation).
        show_split = (self.engine.state is AppState.READY
                      and self.engine.search_results
                      and (self.engine.ui_mode is not UIMode.SEARCH_INPUT
                           or self.incremental is not None))
        body_h = h - 3
        if not show_split:
            # status screen (ui.rs:49-89)
            title, message = rd.status_message(
                self.engine.state, self.engine.spinner_frame, self.input.text)
            self._box(win, 0, 0, body_h, w, title, False)
            mid = body_h // 2 - 1
            for i, line in enumerate(message.split("\n")):
                try:
                    win.addstr(mid + i, max((w - len(line)) // 2, 1),
                               line[:w - 2], curses.A_DIM)
                except curses.error:
                    pass
        else:
            # 30/70 split (ui.rs:13, 91-108)
            left_w = max(w * 30 // 100, 20)
            right_w = w - left_w
            self._box(win, 0, 0, body_h, left_w,
                      f" Search Results ({len(self.engine.search_results)}) ",
                      self.engine.ui_mode is UIMode.SEARCH_RESULTS)
            rows = rd.result_rows(
                self.engine.search_results, self.engine.selected_search_result,
                self.engine.search_results_scroll_offset,
                left_w - 2, body_h - 2, self.directory)
            for i, spans in enumerate(rows[:body_h - 2]):
                self._put_spans(win, 1 + i, 1, spans, left_w - 2)

            sel = self.engine.selected_result()
            if sel is not None:
                title = f" {rd.display_path(sel.chunk.file_path, self.directory)} "
                loaded = (self.engine.current_file_content
                          if self.engine.current_file_path
                          == sel.chunk.file_path else None)
                # `is not None`, not truthiness: a legitimately EMPTY
                # file ('') must render the "(empty file)" preview, not
                # a permanent "Loading file..."
                content = loaded if loaded is not None else "Loading file..."
                self._box(win, 0, left_w, body_h, right_w, title,
                          self.engine.ui_mode is UIMode.FILE_PREVIEW)
                lines = rd.preview_lines(
                    content, sel.chunk.file_path,
                    self.engine.file_preview_scroll_offset,
                    body_h - 2, self.engine.current_search_query,
                    hscroll=(0 if self.engine.preview_wrap
                             else self.engine.file_preview_hscroll))
                row = 1
                for spans in lines:
                    if self.engine.preview_wrap:
                        for wrapped in rd.wrap_spans(spans, right_w - 2):
                            if row > body_h - 2:
                                break
                            self._put_spans(win, row, left_w + 1, wrapped,
                                            right_w - 2)
                            row += 1
                    else:
                        # no-wrap: one display row per line, truncated
                        # at the pane edge ('w' toggles, ←/→ scroll)
                        self._put_spans(win, row, left_w + 1, spans,
                                        right_w - 2)
                        row += 1
                    if row > body_h - 2:
                        break
            else:
                self._box(win, 0, left_w, body_h, right_w, " Preview ",
                          self.engine.ui_mode is UIMode.FILE_PREVIEW)

        self._draw_search_box(win, h - 3, w)
        win.refresh()

    # -- main loop (app.rs:88-105) ------------------------------------------------

    def run(self, stdscr) -> int:
        curses.raw()
        stdscr.keypad(True)
        stdscr.timeout(POLL_INTERVAL_MS)
        _init_styles()
        try:
            curses.mousemask(curses.BUTTON1_PRESSED)
        except curses.error:
            pass

        try:
            self.run_indexing(stdscr)
        except TuiApp._QuitDuringIndex:
            return 0
        while not self.engine.should_quit:
            self.engine.spinner_frame = (self.engine.spinner_frame + 1) % 8
            self.draw(stdscr)
            key = _read_key(stdscr)
            if key is None:
                self._incremental_tick()
                continue
            if key == "mouse":                     # app.rs:150-158 + select
                try:
                    _, mx, my, _, bstate = curses.getmouse()
                except curses.error:
                    continue
                if bstate & curses.BUTTON1_PRESSED:
                    h, w = stdscr.getmaxyx()
                    if ev.handle_mouse(
                            self.engine, mx, my, w, h,
                            split_in_input=self.incremental is not None):
                        self.sync_file_preview()
                continue
            if key in ("resize", "ignore"):
                continue

            self.engine.search_error = None        # app.rs:113
            prev_selected = self.engine.selected_search_result
            h, _ = stdscr.getmaxyx()
            if self.engine.state is AppState.READY:
                result = ev.handle_key_ready(key, self.engine, self.input, h)
            else:
                result = ev.handle_key_non_ready(key, self.input)

            if result is ev.EventResult.EXECUTE_SEARCH:
                self.execute_search(self.input.text)
                if self.incremental is not None:
                    self.incremental.searched(self.input.text)
            elif result is ev.EventResult.OPEN_FILE:
                self.open_file()
            elif result is ev.EventResult.QUIT:
                self.engine.should_quit = True

            if (self.incremental is not None
                    and self.engine.state is AppState.READY
                    and self.engine.ui_mode is UIMode.SEARCH_INPUT):
                self.incremental.on_edit(self.input.text)

            if self.engine.selected_search_result != prev_selected:
                self.sync_file_preview()           # app.rs:144-146
        return 0

    def _incremental_tick(self) -> None:
        """Debounced search-as-you-type ([tui] incremental_search).

        Runs on idle poll ticks (100 ms getch timeout); restores
        SEARCH_INPUT focus afterwards so typing continues uninterrupted
        (engine.execute_search normally moves focus to the results
        pane)."""
        if (self.incremental is None
                or self.engine.state is not AppState.READY
                or self.engine.ui_mode is not UIMode.SEARCH_INPUT):
            return
        q = self.incremental.poll()
        if q is None:
            return
        self.execute_search(q)
        self.engine.ui_mode = UIMode.SEARCH_INPUT


def run_app(directory: Path, config) -> int:
    app = TuiApp(directory, config)
    return curses.wrapper(app.run)
