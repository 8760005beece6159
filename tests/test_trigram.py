"""Trigram substring/regex index: extraction, planner soundness, e2e exactness."""

import os
import re

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from distributedcodesearchengine_ray.stages import trigram as T


def brute_trigrams(s: str):
    b = s.encode("utf-8")
    return sorted({(b[i] << 16) | (b[i + 1] << 8) | b[i + 2] for i in range(len(b) - 2)})


class TestExtraction:
    def test_matches_bruteforce(self):
        texts = ["hello world", "ab", "", "aaaa", "héllo wörld", "x" * 5000, "a b"]
        rows, codes = T.distinct_trigrams(pa.array(texts))
        for i, s in enumerate(texts):
            assert sorted(codes[rows == i].tolist()) == brute_trigrams(s), s

    def test_all_short(self):
        rows, codes = T.distinct_trigrams(pa.array(["a", "bb", ""]))
        assert rows.size == 0 and codes.size == 0

    def test_null_handling(self):
        rows, codes = T.distinct_trigrams(pa.array(["abcd", None, "xyz"]))
        assert sorted(codes[rows == 0].tolist()) == brute_trigrams("abcd")
        assert (rows == 1).sum() == 0
        assert sorted(codes[rows == 2].tolist()) == brute_trigrams("xyz")


class TestPlanner:
    @pytest.mark.parametrize(
        "pattern,expected",
        [
            ("sort (merge|scan) [a-z]+", ["sort "]),
            ("abc+", ["abc"]),
            ("a{3}bc", ["aaabc"]),
            ("foo.*bar", ["bar", "foo"]),
            ("(hello)+ world", [" world", "hello"]),
            ("(?i)foo", []),  # case-insensitive -> full scan
            ("colou?r", ["colo"]),
            ("merge (part|window) small", [" small", "merge "]),
            ("^start.*end$", ["end", "start"]),
            # sre factors the common branch prefix before we ever see it
            ("(abcdef|abcxyz)", ["abc"]),
        ],
    )
    def test_required_literals(self, pattern, expected):
        assert T.required_literals(pattern) == expected

    def test_soundness_random(self):
        """Every text matching the regex must contain every required literal."""
        rng = np.random.default_rng(7)
        words = ["sort", "merge", "scan", "key", "part", "win", "dup", "ab"]
        pats = [
            "sort (merge|scan)+ key",
            "merge{1,3} part",
            "(key )?sort\\w+dup",
            "win(dow)* scan",
            "part\\s+merge|part\\s+scan",
            "a(bc)+d",
            "x{2}(y|z)w{3}",
        ]
        for pat in pats:
            lits = T.required_literals(pat)
            rx = re.compile(pat)
            for _ in range(300):
                text = " ".join(rng.choice(words, size=8).tolist()) + "xxyywwwabcd"
                if rx.search(text):
                    for lit in lits:
                        assert lit in text, (pat, lit, text)


@pytest.fixture(scope="module")
def tri_index(ray_session, tmp_path_factory):
    import ray.data as rd

    root = tmp_path_factory.mktemp("tri")
    rng = np.random.default_rng(11)
    words = ["the", "fast", "sort", "merge", "scan", "key", "join", "部分", "λx"]
    def make_text():
        ws = rng.choice(words, size=int(rng.integers(0, 30))).tolist()
        seps = rng.choice([" ", " ", " ", "\n"], size=max(0, len(ws) - 1))
        return "".join(
            w + s for w, s in zip(ws, list(seps) + [""])
        )

    texts = [make_text() for _ in range(300)]
    docs_path = str(root / "docs.parquet")
    pq.write_table(
        pa.table({"doc_id": pa.array(range(300), pa.int64()), "text": pa.array(texts)}),
        docs_path,
    )
    idx = str(root / "idx")
    os.makedirs(idx)
    stats = T.build_trigram_index(
        rd.read_parquet(docs_path, columns=["doc_id", "text"]), idx, n_buckets=4
    )
    assert stats["n_postings"] > 0
    return idx, docs_path, texts


class TestEndToEnd:
    def test_substring_exact(self, tri_index):
        idx, docs_path, texts = tri_index
        for needle in ["sort merge", "fast", "部分 λx", "zz-no-hit", "ab"]:
            got = T.substring_search(idx, docs_path, needle).tolist()
            exp = [i for i, t in enumerate(texts) if needle in t]
            assert got == exp, needle

    def test_regex_exact(self, tri_index):
        idx, docs_path, texts = tri_index
        for pat in [
            "sort (merge|scan)",
            "key (join|fast) the",
            "(?i)FAST SORT",
            "merge\\s+scan",
        ]:
            got = T.regex_search(idx, docs_path, pat).tolist()
            rx = re.compile(pat)
            exp = [i for i, t in enumerate(texts) if rx.search(t)]
            assert got == exp, pat

    def test_pruning_effective(self, tri_index):
        """A selective needle must touch far fewer candidates than docs."""
        idx, docs_path, texts = tri_index
        cand = T.candidate_ids(idx, T.string_trigrams("sort merge scan"))
        exp = sum(1 for t in texts if "sort merge scan" in t)
        assert cand is not None and exp <= cand.size < len(texts)

    def test_absent_trigram_short_circuits(self, tri_index):
        idx, docs_path, _ = tri_index
        cand = T.candidate_ids(idx, T.string_trigrams("qqqq"))
        assert cand is not None and cand.size == 0
        assert T.substring_search(idx, docs_path, "qqqq").size == 0

    def test_distributed_verify_path(self, tri_index, monkeypatch):
        """Forcing the distributed verification path must not change results."""
        idx, docs_path, texts = tri_index
        monkeypatch.setattr(T, "DRIVER_VERIFY_ROWS", 0)
        got = T.substring_search(idx, docs_path, "sort merge").tolist()
        assert got == [i for i, t in enumerate(texts) if "sort merge" in t]
        got = T.regex_search(idx, docs_path, "(?i)FAST sort").tolist()
        rx = re.compile("(?i)FAST sort")
        assert got == [i for i, t in enumerate(texts) if rx.search(t)]

    def test_grep_lines_exact(self, tri_index):
        """grep_lines == brute-force per-line scan (1-based line numbers)."""
        idx, docs_path, texts = tri_index
        for needle in ["sort merge", "fast", "zz-no-hit"]:
            got = T.grep_lines(idx, docs_path, needle)
            exp = [
                (i, ln + 1, line)
                for i, t in enumerate(texts)
                for ln, line in enumerate(t.split("\n"))
                if needle in line
            ]
            assert list(
                zip(
                    got["doc_id"].to_pylist(),
                    got["line_no"].to_pylist(),
                    got["line"].to_pylist(),
                )
            ) == exp, needle

    def test_grep_lines_distributed_path(self, tri_index, monkeypatch):
        idx, docs_path, texts = tri_index
        monkeypatch.setattr(T, "DRIVER_VERIFY_ROWS", 0)
        got = T.grep_lines(idx, docs_path, "fast")
        exp = [
            (i, ln + 1, line)
            for i, t in enumerate(texts)
            for ln, line in enumerate(t.split("\n"))
            if "fast" in line
        ]
        assert (
            list(
                zip(
                    got["doc_id"].to_pylist(),
                    got["line_no"].to_pylist(),
                    got["line"].to_pylist(),
                )
            )
            == exp
        )

    def test_substring_nocase_exact(self, tri_index):
        """Case-insensitive search == brute-force casefold scan, and the
        variant-group pruning actually prunes."""
        idx, docs_path, texts = tri_index
        for needle in ["SORT Merge", "FaSt", "ZZ-No-Hit"]:
            got = T.substring_search_nocase(idx, docs_path, needle).tolist()
            exp = [i for i, t in enumerate(texts) if needle.lower() in t.lower()]
            assert got == exp, needle
        groups = T._case_variant_groups("SoRt MeRgE ScAn")
        cand = T.candidate_ids_groups(idx, groups)
        assert cand.size < len(texts)

    def test_case_variant_groups_shape(self):
        groups = T._case_variant_groups("aB3")
        assert groups is not None and len(groups) == 1
        # 2 variants for 'a', 2 for 'B', 1 for '3' -> 4 codes
        assert groups[0].size == 4
        assert T._case_variant_groups("部分abc") is None  # non-ASCII
        assert T._case_variant_groups("ab") is None  # too short


class TestCorpusGrep:
    @pytest.fixture(scope="class")
    def corpus(self, ray_session, tmp_path_factory):
        from distributedcodesearchengine_ray.sources.corpus import write_corpus
        from distributedcodesearchengine_ray.stages.corpus_grep import (
            build_corpus_trigram_index,
        )

        root = tmp_path_factory.mktemp("cgrep")
        cdir = str(root / "corpus")
        write_corpus(cdir, n_files=120, seed=3, num_shards=4)
        idx = str(root / "tri")
        sig = build_corpus_trigram_index(cdir, idx)
        assert sig["total_rows"] == 120 and sig["n_fragments"] == 4
        return cdir, idx

    def _truth(self, cdir, pred):
        import pyarrow.dataset as pads

        frags = sorted(
            os.path.join(cdir, f) for f in os.listdir(cdir) if f.endswith(".parquet")
        )
        rows = []
        for p in frags:
            t = pq.read_table(p, columns=["repo", "path", "content"])
            for r, pth, c in zip(
                t["repo"].to_pylist(), t["path"].to_pylist(), t["content"].to_pylist()
            ):
                for ln, line in enumerate(c.split("\n")):
                    if pred(line):
                        rows.append((r, pth, ln + 1, line))
        rows.sort()
        return rows

    def test_substring_matches_bruteforce(self, corpus):
        from distributedcodesearchengine_ray.stages.corpus_grep import corpus_grep

        cdir, idx = corpus
        for needle in ["def ", "parse_json", "no-such-string-zzz"]:
            got = corpus_grep(idx, cdir, needle)
            exp = self._truth(cdir, lambda l: needle in l)
            assert (
                list(
                    zip(
                        got["repo"].to_pylist(),
                        got["path"].to_pylist(),
                        got["line_no"].to_pylist(),
                        got["line"].to_pylist(),
                    )
                )
                == exp
            ), needle

    def test_regex_and_nocase(self, corpus):
        from distributedcodesearchengine_ray.stages.corpus_grep import corpus_grep

        cdir, idx = corpus
        got = corpus_grep(idx, cdir, "def [a-z_]+_json", regex=True)
        rx = re.compile("def [a-z_]+_json")
        exp = self._truth(cdir, lambda l: bool(rx.search(l)))
        assert (
            list(
                zip(
                    got["repo"].to_pylist(),
                    got["path"].to_pylist(),
                    got["line_no"].to_pylist(),
                    got["line"].to_pylist(),
                )
            )
            == exp
        )
        got = corpus_grep(idx, cdir, "PARSE_JSON", ignore_case=True)
        exp = self._truth(cdir, lambda l: "parse_json" in l.lower())
        assert got.num_rows == len(exp)

    def test_rebuild_skipped_on_same_signature(self, corpus):
        from distributedcodesearchengine_ray.stages.corpus_grep import (
            build_corpus_trigram_index,
        )

        cdir, idx = corpus
        import time

        t0 = time.time()
        build_corpus_trigram_index(cdir, idx)  # signature match -> no-op
        assert time.time() - t0 < 1.0
