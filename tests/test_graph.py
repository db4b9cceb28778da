"""Fixed-point PageRank: serial-oracle equality on planted graphs + the
sf0.001 DuckDB cross-check of the full unrolled-SQL entry."""

import duckdb
import numpy as np
import pandas as pd

SF = "/root/testdata/sf0.001"


def serial_pagerank(nodes, pairs, d_pct=85, iters=5, scale=10**9):
    """The pinned integer recurrence, straight-line (the executable spec
    for graph.pagerank)."""
    n = len(nodes)
    base = scale // n
    tele = ((100 - d_pct) * base) // 100
    edges = [(a, b) for a, b in pairs] + [(b, a) for a, b in pairs]
    deg = {}
    for s, _ in edges:
        deg[s] = deg.get(s, 0) + 1
    r = {v: base for v in nodes}
    for _ in range(iters):
        acc = {v: 0 for v in nodes}
        for s, t in edges:
            acc[t] += r[s] // deg[s]
        r = {v: tele + (d_pct * acc[v]) // 100 for v in nodes}
    return r


class TestPagerank:
    def _run(self, ray_session, nodes, pairs, **kw):
        import ray.data

        from grawler_ray.functions.graph import pagerank

        nodes_ds = ray.data.from_pandas(pd.DataFrame({"v": nodes}))
        pairs_ds = ray.data.from_pandas(
            pd.DataFrame({"a": [a for a, _ in pairs], "b": [b for _, b in pairs]})
        )
        out = pagerank(nodes_ds, pairs_ds, **kw).to_pandas()
        return dict(zip(out["v"], out["rank"]))

    def test_line_graph_vs_serial(self, ray_session):
        nodes = list(range(6))
        pairs = [(0, 1), (1, 2), (2, 3)]  # 4-node path + 2 isolated
        got = self._run(ray_session, nodes, pairs)
        exp = serial_pagerank(nodes, pairs)
        assert got == exp
        # structure: interior path nodes outrank endpoints, isolated lowest
        assert got[1] > got[0] and got[2] > got[3]
        assert got[4] == got[5] < got[0]

    def test_star_hub_vs_serial(self, ray_session):
        nodes = list(range(10))
        pairs = [(0, i) for i in range(1, 8)]  # hub 0, leaves 1-7, 8/9 isolated
        got = self._run(ray_session, nodes, pairs, iters=3)
        exp = serial_pagerank(nodes, pairs, iters=3)
        assert got == exp
        assert got[0] == max(got.values())

    def test_no_edges(self, ray_session):
        nodes = [7, 8, 9]
        got = self._run(ray_session, nodes, [])
        exp = serial_pagerank(nodes, [])
        assert got == exp

    def test_vs_duckdb_sf(self, ray_session):
        import __ray_entry__ as e

        con = duckdb.connect()
        con.execute(
            f"CREATE VIEW embeddings AS SELECT * FROM read_parquet('{SF}/embeddings.parquet')"
        )
        got = (
            e.queries()["pagerank"](SF)
            .to_pandas()
            .sort_values("vec_id")
            .reset_index(drop=True)
        )
        exp = (
            con.execute(e.oracle_sql()["pagerank"])
            .fetchdf()
            .sort_values("vec_id")
            .reset_index(drop=True)
        )
        pd.testing.assert_frame_equal(
            got[sorted(got.columns)], exp[sorted(exp.columns)], check_dtype=False
        )
        # connected nodes must outrank isolated ones for the test to mean much
        assert got["rank"].nunique() > 1
