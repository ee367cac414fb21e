"""Session manager + SQL passthrough tests (service surface)."""

from __future__ import annotations

import shutil

import pytest

from heapdumpstardiver_spark.service import SessionManager, list_tables, query_heap
from tests.heap_fixtures import generate_heap_warehouse


@pytest.fixture()
def manager(spark, tmp_path):
    d = tmp_path / "wh1"
    d.mkdir()
    generate_heap_warehouse(str(d))
    mgr = SessionManager(spark)
    mgr.create_session(d)
    yield mgr
    for sid in list(mgr.sessions):
        mgr.sessions[sid].close()


def test_single_active_default_and_views(manager):
    sess = manager.get()  # no id → the only active session
    assert sess.session_id == "wh1"
    info = list_tables(manager)
    assert "_object_index" in info["tables"]
    assert info["tables"]["java.lang.String"]["view"] == "wh1__java_lang_String"


def test_query_heap_pagination(manager):
    view = manager.get().view_name("_object_index")
    page1 = query_heap(manager, f"SELECT obj_id, type_name FROM {view} ORDER BY obj_id", limit=100)
    assert page1["row_count"] == 100 and page1["has_more"] and page1["next_offset"] == 100
    page2 = query_heap(
        manager,
        f"SELECT obj_id, type_name FROM {view} ORDER BY obj_id",
        limit=100,
        offset=page1["next_offset"],
    )
    assert page2["offset"] == 100
    assert page1["rows"][-1]["obj_id"] < page2["rows"][0]["obj_id"]


def test_pagination_without_order_by_warns(manager):
    view = manager.get().view_name("_object_index")
    paged = query_heap(manager, f"SELECT obj_id FROM {view}", limit=100)
    assert paged["has_more"] and "ORDER BY" in paged["warning"]
    ordered = query_heap(
        manager, f"SELECT obj_id FROM {view} ORDER BY obj_id", limit=100
    )
    assert "warning" not in ordered
    # a single complete page is order-stable — no warning either
    whole = query_heap(manager, f"SELECT obj_id FROM {view}", limit=100000)
    assert not whole["has_more"] and "warning" not in whole


def test_query_heap_error_isolation(manager):
    out = query_heap(manager, "SELECT * FROM nonexistent_view_xyz")
    assert "error" in out


def test_session_collision_and_close(manager, tmp_path, spark):
    d2 = tmp_path / "wh1x"
    shutil.copytree(tmp_path / "wh1", d2)
    s2 = manager.create_session(d2)
    assert s2.session_id == "wh1x"
    with pytest.raises(ValueError, match="Multiple active"):
        manager.get()
    manager.close_session("wh1x")
    assert manager.get().session_id == "wh1"
    # collision suffix: same stem creates _2
    s3 = manager.create_session(tmp_path / "wh1")
    assert s3.session_id == "wh1_2"
