"""Link-extraction kernel + web-graph operators (T49/T50).

Kernel rules pinned exactly (href forms, scheme filtering, relative
resolution, drop-subtree exclusion), PageRank checked against a dense NumPy
power-iteration reference, and the operator path checked end-to-end on a
synthesized page corpus.
"""

import numpy as np
import pytest

from pdf_drawing_ocr_recognition_spark.kernel.links import (
    extract_links,
    resolve_href,
)

BASE = "http://h0.example.com/p/7"


class TestResolveHref:
    def test_absolute_kept_verbatim(self):
        assert (
            resolve_href("http://a.example.com/x?q=1", BASE)
            == "http://a.example.com/x?q=1"
        )

    def test_scheme_and_host_lowercased_path_preserved(self):
        assert (
            resolve_href("HTTPS://WWW.Example.COM/Path/X", BASE)
            == "https://www.example.com/Path/X"
        )

    def test_root_relative(self):
        assert resolve_href("/p/42", BASE) == "http://h0.example.com/p/42"

    def test_document_relative(self):
        assert resolve_href("sub.html", BASE) == "http://h0.example.com/p/sub.html"

    def test_dotdot_collapsed(self):
        assert resolve_href("../up.html", BASE) == "http://h0.example.com/up.html"

    def test_protocol_relative_inherits_scheme(self):
        assert (
            resolve_href("//cdn.example.com/lib", "https://x.com/a")
            == "https://cdn.example.com/lib"
        )

    def test_fragment_only_skipped(self):
        assert resolve_href("#top", BASE) is None

    def test_fragment_stripped_from_resolved(self):
        assert resolve_href("/a#sec", BASE) == "http://h0.example.com/a"

    @pytest.mark.parametrize(
        "href", ["mailto:x@y.z", "javascript:void(0)", "tel:+123", "data:text/plain,x"]
    )
    def test_non_http_schemes_skipped(self, href):
        assert resolve_href(href, BASE) is None

    def test_empty_href_skipped(self):
        assert resolve_href("", BASE) is None


class TestExtractLinks:
    def test_quote_styles_and_entities(self):
        html = (
            "<a href=\"/a\">dq</a><a href='/b'>sq</a><a href=/c>unq</a>"
            "<a href=\"/d?x=1&amp;y=2\">ent</a>"
        )
        links = extract_links(html, BASE)
        assert [l["href"] for l in links] == [
            "http://h0.example.com/a",
            "http://h0.example.com/b",
            "http://h0.example.com/c",
            "http://h0.example.com/d?x=1&y=2",
        ]
        assert [l["anchor"] for l in links] == ["dq", "sq", "unq", "ent"]

    def test_anchor_text_normalized_and_unescaped(self):
        html = "<a href='/x'>  two\n  words &amp; <b>more</b> </a>"
        (link,) = extract_links(html, BASE)
        assert link["anchor"] == "two words & more"

    def test_script_subtree_links_dropped(self):
        html = "<script><a href='http://evil.example.com/'>x</a></script><a href='/ok'>ok</a>"
        links = extract_links(html, BASE)
        assert [l["href"] for l in links] == ["http://h0.example.com/ok"]

    def test_nav_links_kept(self):
        # boilerplate regions lose their TEXT in extraction but keep LINKS
        html = "<nav><a href='/'>home</a></nav>"
        (link,) = extract_links(html, BASE)
        assert link["href"] == "http://h0.example.com/"
        assert link["anchor"] == "home"

    def test_nested_anchor_implicitly_closes(self):
        html = "<a href='/a'>outer <a href='/b'>inner</a></a>"
        links = extract_links(html, BASE)
        assert [(l["href"], l["anchor"]) for l in links] == [
            ("http://h0.example.com/a", "outer"),
            ("http://h0.example.com/b", "inner"),
        ]

    def test_href_missing_produces_no_link(self):
        assert extract_links("<a name='t'>anchor target</a>", BASE) == []

    def test_duplicates_preserved_in_order(self):
        html = "<a href='/a'>1</a><a href='/a'>2</a>"
        assert [l["anchor"] for l in extract_links(html, BASE)] == ["1", "2"]

    def test_unclosed_anchor_at_eof_flushed(self):
        (link,) = extract_links("<a href='/a'>tail text", BASE)
        assert link["anchor"] == "tail text"

    def test_malformed_markup_no_crash(self):
        assert extract_links("<a href='/a'<b>>x</a><<<", BASE) != []


def _ref_pagerank(edges, damping=0.85, n_iters=3):
    """Dense NumPy power iteration (incl. dangling mass) — the oracle."""
    nodes = sorted({u for u, _, _ in edges} | {v for _, v, _ in edges})
    idx = {h: i for i, h in enumerate(nodes)}
    n = len(nodes)
    P = np.zeros((n, n))
    for u, v, w in edges:
        P[idx[v], idx[u]] += w
    out = P.sum(axis=0)
    r = np.full(n, 1.0 / n)
    for _ in range(n_iters):
        contrib = np.zeros(n)
        nz = out > 0
        contrib = P[:, nz] @ (r[nz] / out[nz])
        dm = r[~nz].sum()
        r = (1 - damping) / n + damping * (contrib + dm / n)
    return {h: r[idx[h]] for h in nodes}


class TestPagerankOperator:
    def _run(self, spark, edges, **kw):
        from pdf_drawing_ocr_recognition_spark.operators.links import pagerank

        df = spark.createDataFrame(edges, ["src_host", "dst_host", "weight"])
        got = {r["node"]: r["rank"] for r in pagerank(df, **kw).collect()}
        return got

    def test_matches_numpy_reference(self, spark):
        edges = [("a", "b", 2), ("b", "c", 1), ("c", "a", 1), ("a", "c", 1)]
        got = self._run(spark, edges)
        want = _ref_pagerank(edges)
        assert set(got) == set(want)
        for h in want:
            assert got[h] == pytest.approx(want[h], abs=1e-12)

    def test_dangling_node_mass_redistributed(self, spark):
        # 'sink' has no out-edges: its rank must be redistributed, ranks sum to 1
        edges = [("a", "sink", 1), ("b", "a", 1), ("a", "b", 1)]
        got = self._run(spark, edges)
        want = _ref_pagerank(edges)
        for h in want:
            assert got[h] == pytest.approx(want[h], abs=1e-12)
        assert sum(got.values()) == pytest.approx(1.0, abs=1e-9)

    def test_n_iters_validation(self, spark):
        from pdf_drawing_ocr_recognition_spark.operators.links import pagerank

        df = spark.createDataFrame([("a", "b", 1)], ["src_host", "dst_host", "weight"])
        with pytest.raises(ValueError):
            pagerank(df, n_iters=0)


class TestLinkGraphEndToEnd:
    def test_extract_and_aggregate(self, spark):
        from pdf_drawing_ocr_recognition_spark.operators.links import (
            extract_page_links,
            host_link_graph,
        )

        rows = [
            (
                "http://h0.example.com/p/1",
                (
                    "<html><body><p><a href='/p/9'>self-host</a>"
                    "<a href='http://h1.example.com/p/2'>cross</a>"
                    "<a href='http://h1.example.com/p/3'>cross2</a>"
                    "<a href='#x'>frag</a><a href='mailto:a@b.c'>mail</a></p>"
                    "</body></html>"
                ).encode(),
            ),
            (
                "http://h1.example.com/p/2",
                "<html><body><a href='http://h0.example.com/p/1'>back</a></body></html>".encode(),
            ),
        ]
        pages = spark.createDataFrame(rows, "url string, html binary")
        links = extract_page_links(pages)
        assert links.count() == 4
        edges = {
            (r["src_host"], r["dst_host"]): r["weight"]
            for r in host_link_graph(links).collect()
        }
        assert edges == {
            ("h0.example.com", "h0.example.com"): 1,
            ("h0.example.com", "h1.example.com"): 2,
            ("h1.example.com", "h0.example.com"): 1,
        }

    def test_plan_single_narrow_python_stage(self, spark):
        """extract_page_links: scan → one MapInPandas, zero Exchange."""
        from pdf_drawing_ocr_recognition_spark.operators.links import (
            extract_page_links,
        )

        pages = spark.createDataFrame(
            [("http://h0.example.com/p/1", b"<a href='/x'>y</a>")],
            "url string, html binary",
        )
        plan = extract_page_links(pages)._jdf.queryExecution().executedPlan().toString()
        assert "MapInPandas" in plan
        assert "Exchange" not in plan


def _ref_trustrank(edges, seeds, damping=0.85, n_iters=3):
    """Dense NumPy seeded power iteration — the TrustRank oracle."""
    nodes = sorted({u for u, _, _ in edges} | {v for _, v, _ in edges})
    idx = {h: i for i, h in enumerate(nodes)}
    n = len(nodes)
    P = np.zeros((n, n))
    for u, v, w in edges:
        P[idx[v], idx[u]] += w
    out = P.sum(axis=0)
    tele = np.zeros(n)
    present = [s for s in seeds if s in idx]
    for s in present:
        tele[idx[s]] = 1.0 / len(present)
    r = tele.copy()
    for _ in range(n_iters):
        nz = out > 0
        contrib = P[:, nz] @ (r[nz] / out[nz])
        dm = r[~nz].sum()
        r = (1 - damping) * tele + damping * (contrib + dm * tele)
    return {h: r[idx[h]] for h in nodes}


class TestTrustrankOperator:
    def _run(self, spark, edges, seeds, **kw):
        from pdf_drawing_ocr_recognition_spark.operators.links import trustrank

        df = spark.createDataFrame(edges, ["src_host", "dst_host", "weight"])
        sdf = spark.createDataFrame([(s,) for s in seeds], ["node"])
        rows = trustrank(df, sdf, **kw).collect()
        return (
            {r["node"]: r["rank"] for r in rows},
            {r["node"]: r["is_seed"] for r in rows},
        )

    def test_matches_numpy_reference(self, spark):
        edges = [("a", "b", 2), ("b", "c", 1), ("c", "a", 1), ("a", "c", 1)]
        got, is_seed = self._run(spark, edges, ["a"])
        want = _ref_trustrank(edges, ["a"])
        assert set(got) == set(want)
        for h in want:
            assert got[h] == pytest.approx(want[h], abs=1e-12)
        assert is_seed == {"a": True, "b": False, "c": False}

    def test_spam_island_gets_exact_zero(self, spark):
        # x<->y interlink densely but are unreachable from the seed: trust
        # must be EXACTLY 0.0 (not merely small) — no teleport, no inflow.
        edges = [("a", "b", 1), ("x", "y", 5), ("y", "x", 5)]
        got, _ = self._run(spark, edges, ["a"])
        assert got["x"] == 0.0 and got["y"] == 0.0
        want = _ref_trustrank(edges, ["a"])
        for h in want:
            assert got[h] == pytest.approx(want[h], abs=1e-12)

    def test_dangling_mass_returns_to_seeds_sum_one(self, spark):
        # 'sink' dangles: its trust re-teleports to the seed set each round,
        # so total mass stays exactly 1.
        edges = [("a", "sink", 1), ("a", "b", 1), ("b", "a", 1)]
        got, _ = self._run(spark, edges, ["a", "b"])
        want = _ref_trustrank(edges, ["a", "b"])
        for h in want:
            assert got[h] == pytest.approx(want[h], abs=1e-12)
        assert sum(got.values()) == pytest.approx(1.0, abs=1e-9)

    def test_seed_outside_graph_ignored_all_outside_raises(self, spark):
        from pdf_drawing_ocr_recognition_spark.operators.links import trustrank

        edges = [("a", "b", 1)]
        got, _ = self._run(spark, edges, ["a", "ghost"])
        want = _ref_trustrank(edges, ["a"])  # ghost carries no mass
        for h in want:
            assert got[h] == pytest.approx(want[h], abs=1e-12)
        df = spark.createDataFrame(edges, ["src_host", "dst_host", "weight"])
        sdf = spark.createDataFrame([("ghost",)], ["node"])
        with pytest.raises(ValueError):
            trustrank(df, sdf)


class TestResolveRedirects:
    def _run(self, spark, edges, **kw):
        from pdf_drawing_ocr_recognition_spark.operators.links import (
            resolve_redirects,
        )

        df = spark.createDataFrame(edges, ["src_url", "dst_url"])
        return {
            r["url"]: (r["final_url"], r["n_hops"], r["resolved"])
            for r in resolve_redirects(df, **kw).collect()
        }

    def test_chains_resolve_with_hop_counts(self, spark):
        got = self._run(spark, [("a", "b"), ("b", "c"), ("c", "d")])
        assert got == {"a": ("d", 3, True), "b": ("d", 2, True),
                       "c": ("d", 1, True)}

    def test_self_loop_and_two_cycle_flagged_not_spun(self, spark):
        got = self._run(spark, [("s", "s"), ("u", "v"), ("v", "u")],
                        max_hops=4)
        assert got["s"] == ("s", 4, False)
        assert got["u"][2] is False and got["v"][2] is False

    def test_over_long_chain_unresolved_at_cap(self, spark):
        edges = [(f"u{i}", f"u{i+1}") for i in range(6)]
        got = self._run(spark, edges, max_hops=3)
        assert got["u0"] == ("u3", 3, False)   # still a redirect at the cap
        assert got["u3"] == ("u6", 3, True)    # tail fits inside the cap

    def test_multiple_observed_targets_min_wins(self, spark):
        got = self._run(spark, [("a", "z"), ("a", "b")])
        assert got["a"] == ("b", 1, True)

    def test_validation(self, spark):
        from pdf_drawing_ocr_recognition_spark.operators.links import (
            resolve_redirects,
        )

        df = spark.createDataFrame([("a", "b")], ["src_url", "dst_url"])
        with pytest.raises(ValueError):
            resolve_redirects(df, max_hops=0)


class TestCocitationPairs:
    """T139 — co-citation link-farm detection (cocitation_pairs)."""

    def _edges(self, spark, rows):
        return spark.createDataFrame(rows, "src_host string, dst_host string")

    def test_backlink_ring_detected_content_blind(self, spark):
        from pdf_drawing_ocr_recognition_spark.operators.links import (
            cocitation_pairs,
        )

        rows = [(f"s{j}", f"farm{f}") for j in range(4) for f in range(3)]
        rows += [("s0", "legit"), ("x9", "legit")]
        out = cocitation_pairs(self._edges(spark, rows)).collect()
        got = {(r["host_a"], r["host_b"]): r for r in out}
        assert set(got) == {
            ("farm0", "farm1"), ("farm0", "farm2"), ("farm1", "farm2")
        }
        r = got[("farm0", "farm1")]
        assert r["n_cociting"] == 4 and r["jaccard_ppm"] == 1000000

    def test_partial_overlap_below_threshold(self, spark):
        from pdf_drawing_ocr_recognition_spark.operators.links import (
            cocitation_pairs,
        )

        # a: {s0,s1,s2}; b: {s2,s3,s4} -> jaccard 1/5 = 200000 ppm
        rows = [("s0", "a"), ("s1", "a"), ("s2", "a"),
                ("s2", "b"), ("s3", "b"), ("s4", "b")]
        df = self._edges(spark, rows)
        assert cocitation_pairs(df, min_jaccard_ppm=500000).count() == 0
        weak = cocitation_pairs(df, min_jaccard_ppm=100000).collect()
        assert len(weak) == 1 and weak[0]["jaccard_ppm"] == 200000

    def test_directory_page_fanout_cap(self, spark):
        """A hub linking more hosts than the cap asserts no pairwise
        affinity — the quadratic-fan-out guard."""
        from pdf_drawing_ocr_recognition_spark.operators.links import (
            cocitation_pairs,
        )

        rows = [("hub", f"t{i}") for i in range(30)]
        assert cocitation_pairs(
            self._edges(spark, rows), max_fanout=20
        ).count() == 0
        assert cocitation_pairs(
            self._edges(spark, rows), max_fanout=50, min_jaccard_ppm=1
        ).count() == 30 * 29 // 2

    def test_duplicate_edges_counted_once(self, spark):
        from pdf_drawing_ocr_recognition_spark.operators.links import (
            cocitation_pairs,
        )

        rows = [("s0", "a"), ("s0", "a"), ("s0", "b"), ("s0", "b")]
        out = cocitation_pairs(self._edges(spark, rows)).collect()
        assert len(out) == 1
        assert out[0]["n_cociting"] == 1 and out[0]["n_in_a"] == 1


class TestLinkReciprocity:
    """T147 — link-exchange detection (link_reciprocity)."""

    def _edges(self, spark, rows):
        return spark.createDataFrame(rows, "src_host string, dst_host string")

    def test_exchange_ring_vs_chain_vs_partial(self, spark):
        from pdf_drawing_ocr_recognition_spark.operators.links import (
            link_reciprocity,
        )

        rows = [("a", "b"), ("b", "a"),          # pure exchange
                ("c1", "c2"), ("c2", "c3"),      # one-way chain
                ("hub", "a"), ("hub", "b"), ("a", "hub")]  # partial
        out = {r["host"]: r for r in link_reciprocity(
            self._edges(spark, rows)).collect()}
        assert out["b"]["reciprocity_ppm"] == 1000000
        assert out["c1"]["reciprocity_ppm"] == 0
        assert out["c2"]["reciprocity_ppm"] == 0
        # hub: out={a,b}, only a links back -> 1/2
        assert out["hub"]["n_out"] == 2
        assert out["hub"]["n_reciprocal"] == 1
        assert out["hub"]["reciprocity_ppm"] == 500000

    def test_self_loops_and_duplicate_edges_ignored(self, spark):
        from pdf_drawing_ocr_recognition_spark.operators.links import (
            link_reciprocity,
        )

        rows = [("a", "a"), ("a", "b"), ("a", "b"), ("b", "a"), ("b", "a")]
        out = {r["host"]: r for r in link_reciprocity(
            self._edges(spark, rows)).collect()}
        assert out["a"]["n_out"] == 1 and out["a"]["reciprocity_ppm"] == 1000000
        assert out["b"]["n_out"] == 1

    def test_partition_invariance(self, spark):
        from pdf_drawing_ocr_recognition_spark.operators.links import (
            link_reciprocity,
        )

        rows = [(f"h{i % 9}", f"h{(i * 5 + 1) % 9}") for i in range(90)]
        df = self._edges(spark, rows)
        a = sorted(map(tuple, link_reciprocity(df).collect()))
        b = sorted(map(tuple, link_reciprocity(df.repartition(7)).collect()))
        assert a == b


class TestHitsScores:
    """T148 — exact-integer HITS (hits_scores)."""

    def _edges(self, spark, rows):
        return spark.createDataFrame(rows, "src_host string, dst_host string")

    @staticmethod
    def _twin(edges, n_iters=2, scale=1_000_000):
        """Pure-Python replay of the quantized algorithm."""
        e = sorted({(s, d) for s, d in edges if s != d})
        nodes = sorted({n for p in e for n in p})
        h = {n: scale for n in nodes}

        def norm(x):
            mx = max(x.values()) if x else 0
            return {n: (v * scale) // mx if mx > 0 else 0 for n, v in x.items()}

        a = {}
        for _ in range(n_iters):
            a = norm({n: sum(h[s] for s, d in e if d == n) for n in nodes})
            h = norm({n: sum(a[d] for s, d in e if s == n) for n in nodes})
        return {n: (a[n], h[n]) for n in nodes}

    def test_matches_pure_twin_bitwise(self, spark):
        from pdf_drawing_ocr_recognition_spark.operators.links import (
            hits_scores,
        )

        rows = [(f"h{i % 3}", f"a{(i * 2) % 5}") for i in range(15)]
        rows += [("a0", "h1"), ("a1", "a2"), ("solo", "a4")]
        want = self._twin(rows)
        got = {
            r["host"]: (r["authority_ppm"], r["hub_ppm"])
            for r in hits_scores(self._edges(spark, rows)).collect()
        }
        assert got == want

    def test_hub_authority_separation(self, spark):
        from pdf_drawing_ocr_recognition_spark.operators.links import (
            hits_scores,
        )

        # classic bipartite: hubs point at authorities
        rows = [(f"hub{i}", f"auth{j}") for i in range(2) for j in range(3)]
        out = {r["host"]: r for r in hits_scores(
            self._edges(spark, rows)).collect()}
        for i in range(2):
            assert out[f"hub{i}"]["hub_ppm"] == 1000000
            assert out[f"hub{i}"]["authority_ppm"] == 0
        for j in range(3):
            assert out[f"auth{j}"]["authority_ppm"] == 1000000
            assert out[f"auth{j}"]["hub_ppm"] == 0

    def test_partition_invariance_bitwise(self, spark):
        from pdf_drawing_ocr_recognition_spark.operators.links import (
            hits_scores,
        )

        rows = [(f"h{i % 7}", f"h{(i * 3 + 1) % 7}") for i in range(70)]
        df = self._edges(spark, rows)
        a = sorted(map(tuple, hits_scores(df).collect()))
        b = sorted(map(tuple, hits_scores(df.repartition(9)).collect()))
        assert a == b
