"""Curses TUI (≙ reference src/tui/: ratatui app loop, events, rendering)."""
