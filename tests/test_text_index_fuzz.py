"""Randomized differential test for the disk-resident text index.

A deterministic (seeded) random op sequence — batched adds, per-file
deletes, searches, reopens (which trigger merges/compaction) — runs
against BOTH engines and a naive in-memory oracle that recomputes BM25
from first principles on every query. Catches state-machine bugs the
scenario tests can't enumerate: merge/tombstone interactions, dense- vs
sparse-path selection, file-run lookups after compaction, manifest
reload edge cases.
"""

import math
import random
import re
from collections import Counter
from pathlib import Path

import pytest

import sema_tpu.index.text_index as ti
from sema_tpu.types import Chunk

K1, B = 1.2, 0.75
_SPLIT = re.compile(r"[^\W_]+", re.UNICODE)

WORDS = ("alpha beta gamma delta epsilon zeta eta theta iota kappa "
         "red green blue cyan violet shade tone hue tint "
         "parse build merge split scan read write sync").split()


def toks(text):
    return [m.group(0).lower() for m in _SPLIT.finditer(text)
            if len(m.group(0)) <= 40]


class Oracle:
    """Naive reference: list of (id, path, content, alive)."""

    def __init__(self):
        self.docs = []

    def add(self, chunks):
        for c in chunks:
            self.docs.append([c.id, str(c.file_path), c.content, True])

    def remove_file(self, path):
        n = 0
        for d in self.docs:
            if d[3] and d[1] == str(path):
                d[3] = False
                n += 1
        return n

    def live(self):
        return [d for d in self.docs if d[3]]

    def search(self, query, limit):
        # clause structure comes from the (separately unit-tested)
        # shared parser; matching and BM25 are recomputed here from the
        # grammar spec, independent of both engines
        q = ti._parse_query(query)
        live = self.live()
        n = len(live)

        def path_ok(d):
            pt = toks(d[1])
            for tk, isp in q.path_must:
                if isp:
                    m = len(tk)
                    if not any(pt[i:i + m] == list(tk)
                               for i in range(len(pt) - m + 1)):
                        return False
                elif not all(t in pt for t in tk):
                    return False
            for tk, isp in q.path_not:
                if isp:
                    m = len(tk)
                    if any(pt[i:i + m] == list(tk)
                           for i in range(len(pt) - m + 1)):
                        return False
                elif all(t in pt for t in tk):
                    return False
            return True

        if n == 0 or (not q.score_terms and not q.path_must):
            return []
        if not q.score_terms:
            # filter-only (just path: requirements): score 0.0, doc order
            return [(d[0], 0.0) for d in live if path_ok(d)][:limit]
        lens = [len(toks(d[2])) for d in live]
        avg = (sum(lens) / n) or 1.0
        scores = [0.0] * n
        for term, boost in zip(q.score_terms, q.score_boosts):
            hits = [(i, Counter(toks(d[2]))[term])
                    for i, d in enumerate(live)
                    if term in toks(d[2])]
            df = len(hits)
            if df == 0:
                continue
            idf = math.log(1.0 + (n - df + 0.5) / (df + 0.5))
            for i, tf in hits:
                denom = tf + K1 * (1 - B + B * lens[i] / avg)
                scores[i] += boost * (idf * tf * (K1 + 1) / denom)

        def has_phrases(content, pts):
            joined = "\x00" + "\x00".join(toks(content)) + "\x00"
            return all(("\x00" + "\x00".join(pt) + "\x00") in joined
                       for pt in pts)

        def qualifies(i):
            tk = set(toks(live[i][2]))
            if any(not set(ms) <= tk for ms in q.must_sets):
                return False
            if any(set(ns) <= tk for ns in q.not_sets):
                return False
            if q.req_phrases and not has_phrases(live[i][2],
                                                 q.req_phrases):
                return False
            if any(has_phrases(live[i][2], [np])
                   for np in q.not_phrases):
                return False
            if not path_ok(live[i]):
                return False
            return True

        ranked = [i for i in sorted(
            (i for i in range(n) if scores[i] > 0),
            key=lambda i: (-scores[i], i))
            if qualifies(i)][:limit]
        return [(live[i][0], scores[i]) for i in ranked]


def make_content(rng, common_bias):
    n = rng.randint(3, 12)
    out = []
    for _ in range(n):
        if rng.random() < common_bias:
            out.append(WORDS[0])       # stop-word-like: dense path food
        else:
            out.append(rng.choice(WORDS))
    return " ".join(out)


@pytest.mark.parametrize("seed", [7, 23, 99])
def test_differential_fuzz(tmp_path, seed):
    rng = random.Random(seed)
    engines = [("py", ti.TextIndex(tmp_path / "py"))]
    try:
        import sema_tpu.native  # noqa: F401
        engines.append(("nt", ti.NativeTextIndex(tmp_path / "nt")))
    except ImportError:
        pass
    oracle = Oracle()
    next_id = 0
    files_alive = []

    def check(query, limit):
        want = oracle.search(query, limit)
        for name, e in engines:
            got = [(c.id, s) for c, s in e.search(query, limit)]
            got_ids = [g[0] for g in got]
            want_ids = [w[0] for w in want]
            assert got_ids == want_ids, (
                seed, query, name, got_ids[:5], want_ids[:5])
            for (gi, gs), (wi, ws) in zip(got, want):
                assert gs == pytest.approx(ws, rel=1e-9), (seed, query)

    for step in range(60):
        op = rng.random()
        if op < 0.45 or not oracle.live():
            nb = rng.randint(1, 12)
            path = f"f{rng.randint(0, 30):03d}.txt"
            batch = [Chunk(id=f"{path}:{next_id + j}",
                           file_path=Path(path), start_line=1, end_line=2,
                           content=make_content(rng, 0.4))
                     for j in range(nb)]
            next_id += nb
            files_alive.append(path)
            oracle.add(batch)
            for _, e in engines:
                e.index_chunks(batch)
        elif op < 0.6 and files_alive:
            path = rng.choice(files_alive)
            want_n = oracle.remove_file(path)
            for _, e in engines:
                assert e.remove_file_chunks(Path(path)) == want_n, (
                    seed, step, path)
        elif op < 0.72:
            # reopen: manifests reload, compaction may trigger
            for i, (name, e) in enumerate(engines):
                e.close()
                cls = type(e)
                engines[i] = (name, cls(tmp_path / name))
        else:
            # word clauses, sometimes with QueryParser operators
            parts = []
            for w in rng.sample(WORDS, rng.randint(1, 3)):
                rr = rng.random()
                if rr < 0.12:
                    parts.append("+" + w)
                elif rr < 0.24:
                    parts.append("-" + w)
                else:
                    parts.append(w)
                if rng.random() < 0.15:
                    # ^boost suffix, occasionally malformed (not a boost)
                    parts[-1] += rng.choice(
                        ("^2", "^0.5", "^3.25", "^1", "^x", "^2."))
            if len(parts) >= 2 and rng.random() < 0.15:
                parts.insert(1, rng.choice(("AND", "OR")))
            if rng.random() < 0.25 and files_alive:
                # path: field clauses — live path tokens (hits),
                # random words (misses), phrases, exclusions
                ptoks = toks(rng.choice(files_alive))
                rr = rng.random()
                if rr < 0.3:
                    parts.append("path:" + rng.choice(ptoks))
                elif rr < 0.5:
                    parts.append("-path:" + rng.choice(ptoks))
                elif rr < 0.7:
                    parts.append('path:"' + " ".join(ptoks) + '"')
                else:
                    parts.append("+path:" + rng.choice(WORDS))
            if rng.random() < 0.04 and files_alive:
                # filter-only query: just the path requirement
                parts = ["path:" + rng.choice(toks(
                    rng.choice(files_alive)))]
            q = " ".join(parts)
            if rng.random() < 0.08:
                q += (f' -"{rng.choice(WORDS)} {rng.choice(WORDS)}"')
            r = rng.random()
            if r < 0.15:
                # random phrase: usually a positional MISS
                q += (' "' + " ".join(rng.choice(WORDS)
                                      for _ in range(rng.randint(2, 3)))
                      + '"')
                if rng.random() < 0.3:
                    q += "^2.5"
            elif r < 0.3 and oracle.live():
                # phrase lifted from a live doc: positional HIT path
                # (random pairs almost never co-occur adjacently)
                words = toks(rng.choice(oracle.live())[2])
                if len(words) >= 2:
                    j = rng.randint(0, len(words) - 2)
                    ln = min(rng.randint(2, 3), len(words) - j)
                    q += ' "' + " ".join(words[j:j + ln]) + '"'
                if rng.random() < 0.3:
                    q += f' "{rng.choice(WORDS)} {rng.choice(WORDS)}"'
            check(q, rng.choice((3, 10, 50)))

        if step % 9 == 0:
            for _, e in engines:
                assert e.num_live_docs == len(oracle.live()), (seed, step)

    # final sweep: common term (dense path), rare pair, phrase
    check(WORDS[0], 50)
    check(f"{WORDS[5]} {WORDS[17]}", 10)
    check(f'"{WORDS[0]} {WORDS[1]}"', 10)
    check(f"{WORDS[0]} -{WORDS[1]}", 50)          # exclusion
    check(f"{WORDS[2]} AND {WORDS[3]}", 10)       # conjunction
    check(f"+{WORDS[0]} {WORDS[9]}", 50)          # must + should
    check(f'{WORDS[0]} -"{WORDS[0]} {WORDS[1]}"', 50)  # phrase exclusion
    check("path:txt", 50)                          # filter-only, all files
    check(f"{WORDS[0]} -path:txt", 50)             # path-excludes-everything
    check(f"{WORDS[0]} path:f007", 10)             # one file's docs
    check(f"{WORDS[0]}^2 {WORDS[1]}", 50)          # boosted term
    check(f'"{WORDS[0]} {WORDS[1]}"^1.5 {WORDS[2]}', 50)  # boosted phrase
