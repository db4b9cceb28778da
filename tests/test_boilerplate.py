"""CETR main-content extraction: the pinned mean-threshold variant's
selection behavior on hand-built pages, kernel corners, and the Dataset
stage."""

import numpy as np

from grawler_ray.functions.boilerplate import cetr_profile, extract_main_text

NAV = '<div class="nav"><a href="/a">Home</a><a href="/b">About</a><a href="/c">Contact</a><a href="/d">More</a></div>'
PARA = (
    "The quick brown fox jumps over the lazy dog while the river runs "
    "slowly past the old mill and the miller watches the water wheel turn."
)


def _page(lines):
    return "\n".join(lines)


class TestCetrKernel:
    def test_content_kept_nav_dropped(self):
        html = _page(
            [
                NAV,
                "<h1>Title of the piece</h1>",
                f"<p>{PARA}</p>",
                f"<p>{PARA} {PARA}</p>",
                f"<p>{PARA}</p>",
                PARA,
                f"<p>{PARA} {PARA}</p>",
                NAV,
                NAV,
                NAV,
            ]
        )
        out = extract_main_text(html)
        assert PARA in out
        assert "Home" not in out and "Contact" not in out

    def test_script_style_comments_stripped(self):
        html = _page(
            [
                f"<script>\nvar x = '{PARA}';\n</script>",
                f"<style>\n.a {{ content: '{PARA}'; }}\n</style>",
                f"<!-- {PARA} -->",
                f"<p>{PARA}</p>",
            ]
        )
        texts, x, t, _, keep = cetr_profile(html)
        out = extract_main_text(html)
        assert out.count("quick brown fox") == 1  # only the real paragraph
        # the stripped subtrees contribute no text to any line
        assert x.sum() == len(PARA)

    def test_unterminated_script_strips_to_eof(self):
        html = _page([f"<p>{PARA}</p>", "<script>", f"var s = '{PARA}';"])
        out = extract_main_text(html)
        assert "var s" not in out and PARA in out

    def test_uniform_pure_text_keeps_everything(self):
        # no tags, equal-length lines: smoothed == threshold, ties keep
        html = _page(["abcdef"] * 5)
        texts, x, t, sm, keep = cetr_profile(html)
        assert keep.all()
        assert extract_main_text(html) == "\n".join(["abcdef"] * 5)

    def test_empty_and_blank(self):
        assert extract_main_text("") == ""
        texts, x, t, sm, keep = cetr_profile("\n\n")
        assert not keep.any()

    def test_multiline_tag_merges_lines(self):
        html = f'<div\n class="x">{PARA}</div>'
        texts, x, t, _, keep = cetr_profile(html)
        # the tag's internal newline is removed with it: ONE line remains
        assert len(texts) == 1 and t[0] == 2 and x[0] == len(PARA)

    def test_whitespace_collapsed(self):
        out = extract_main_text("<p>a   b\t\tc</p> ok " + PARA)
        assert "a b c" in out


class TestMainContentStage:
    def test_dataset_stage_and_bytes_decode(self, ray_session):
        import ray.data

        from grawler_ray.functions.boilerplate import main_content

        html = _page(
            [
                NAV,
                "<h1>Title of the piece</h1>",
                f"<p>{PARA}</p>",
                f"<p>{PARA} {PARA}</p>",
                f"<p>{PARA}</p>",
                PARA,
                f"<p>{PARA} {PARA}</p>",
                NAV,
                NAV,
                NAV,
            ]
        )
        rows = [
            {"url": "http://a.test/1", "html": html.encode()},
            {"url": "http://a.test/2", "html": b""},
        ]
        out = (
            main_content(ray.data.from_items(rows))
            .to_pandas()
            .sort_values("url")
            .reset_index(drop=True)
        )
        assert list(out.columns) == [
            "url",
            "total_lines",
            "kept_lines",
            "main_chars",
            "main_text",
        ]
        assert out.loc[0, "kept_lines"] >= 1
        assert PARA in out.loc[0, "main_text"]
        assert "Home" not in out.loc[0, "main_text"]
        assert out.loc[1, "main_chars"] == 0 and out.loc[1, "main_text"] == ""
        # serial-kernel equality: the stage is exactly the kernel, batched
        assert out.loc[0, "main_text"] == extract_main_text(html)

    def test_entry_query_runs(self, ray_session):
        import __ray_entry__ as e

        df = e.queries()["main_content"]("/root/testdata/sf0.001").to_pandas()
        assert len(df) > 0
        # crawled HTML pages must keep SOME content overall
        assert df["main_chars"].sum() > 0
        assert (df["kept_lines"] <= df["total_lines"]).all()
