"""Hadoop-FS small-file layer: round trips, atomicity shape, listing."""


from epstein_browser_spark import fsutil


def test_fsutil_roundtrip_and_overwrite(spark, tmp_path):
    base = str(tmp_path / "fs")
    p = f"{base}/sub/manifest.json"
    assert fsutil.read_text(spark, p) is None
    assert fsutil.list_names(spark, base) == []
    fsutil.mkdirs(spark, f"{base}/sub")
    fsutil.write_text(spark, p, '{"v": 1}')
    assert fsutil.read_text(spark, p) == '{"v": 1}'
    fsutil.write_text(spark, p, '{"v": 2}')  # overwrite via tmp+rename
    assert fsutil.read_text(spark, p) == '{"v": 2}'
    names = fsutil.list_names(spark, f"{base}/sub")
    assert "manifest.json" in names and "manifest.json.tmp" not in names
    assert fsutil.exists(spark, p)
    fsutil.delete(spark, p)
    assert not fsutil.exists(spark, p)
