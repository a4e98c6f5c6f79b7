"""Gitignore pattern semantics."""

from sema_tpu.crawl.gitignore import GitignoreMatcher, GitignoreStack


def m(*patterns):
    return GitignoreMatcher(list(patterns))


def test_basic_name():
    gi = m("foo.txt")
    assert gi.match("foo.txt", False) is True
    assert gi.match("a/b/foo.txt", False) is True  # unanchored → any depth
    assert gi.match("foo.txt.bak", False) is None


def test_star_does_not_cross_slash():
    gi = m("*.log")
    assert gi.match("x.log", False) is True
    assert gi.match("a/x.log", False) is True
    gi2 = m("a*b")
    assert gi2.match("axxb", False) is True
    assert gi2.match("ax/xb", False) is None


def test_anchored_with_slash():
    gi = m("build/output.txt")
    assert gi.match("build/output.txt", False) is True
    assert gi.match("x/build/output.txt", False) is None  # anchored


def test_leading_slash_anchors():
    gi = m("/foo")
    assert gi.match("foo", False) is True
    assert gi.match("a/foo", False) is None


def test_dir_only():
    gi = m("node_modules/")
    assert gi.match("node_modules", True) is True
    assert gi.match("node_modules", False) is None


def test_negation_last_wins():
    gi = m("*.log", "!keep.log")
    assert gi.match("debug.log", False) is True
    assert gi.match("keep.log", False) is False
    gi2 = m("!keep.log", "*.log")  # re-ignored by later rule
    assert gi2.match("keep.log", False) is True


def test_double_star_leading():
    gi = m("**/logs")
    assert gi.match("logs", True) is True
    assert gi.match("a/b/logs", True) is True


def test_double_star_trailing():
    gi = m("logs/**")
    assert gi.match("logs/a", False) is True
    assert gi.match("logs/a/b.txt", False) is True
    assert gi.match("logs", True) is None


def test_double_star_infix():
    gi = m("a/**/b")
    assert gi.match("a/b", False) is True
    assert gi.match("a/x/b", False) is True
    assert gi.match("a/x/y/b", False) is True
    assert gi.match("ax/b", False) is None


def test_question_mark():
    gi = m("file?.txt")
    assert gi.match("file1.txt", False) is True
    assert gi.match("file12.txt", False) is None


def test_char_class():
    gi = m("file[0-9].txt")
    assert gi.match("file5.txt", False) is True
    assert gi.match("filex.txt", False) is None


def test_comments_and_blanks():
    gi = m("# comment", "", "  ", "real.txt")
    assert len(gi.rules) == 1
    assert gi.match("real.txt", False) is True


def test_stack_nested_deepest_wins():
    stack = GitignoreStack()
    stack.push("", m("*.log"))
    stack.push("sub", m("!special.log"))
    assert stack.ignored("x.log", False) is True
    assert stack.ignored("sub/x.log", False) is True
    assert stack.ignored("sub/special.log", False) is False


def test_stack_pop_to_scopes_frames():
    stack = GitignoreStack()
    stack.push("", m("*.a"))
    stack.push("d1", m("*.b"))
    stack.pop_to("d2")  # leaving d1 → its frame drops
    assert stack.ignored("d2/x.b", False) is False
    assert stack.ignored("d2/x.a", False) is True
