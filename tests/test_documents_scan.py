"""Directory scan source (reference load_md_files,
setup_vector_search.py:188-216)."""

import pytest

from rag_vertex_ai_vector_search_spark.sources import scan_document_dir
from rag_vertex_ai_vector_search_spark.sources.documents import EmptyCorpusError


def test_scan_reads_md_only(spark, tmp_path):
    (tmp_path / "a.md").write_text("# alpha\ncontent A")
    (tmp_path / "b.md").write_text("# beta\ncontent B")
    (tmp_path / "c.txt").write_text("not markdown")
    (tmp_path / "sub").mkdir()
    (tmp_path / "sub" / "d.md").write_text("# delta")

    df = scan_document_dir(spark, str(tmp_path))
    rows = {r.filename: r.content for r in df.collect()}
    assert set(rows) == {"a.md", "b.md", "d.md"}  # .txt filtered at listing
    assert rows["a.md"] == "# alpha\ncontent A"  # wholetext, not line-split


def test_scan_empty_raises(spark, tmp_path):
    (tmp_path / "only.txt").write_text("nope")
    with pytest.raises(EmptyCorpusError):
        scan_document_dir(spark, str(tmp_path))
