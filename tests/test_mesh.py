"""Mesh selection heuristics (parallel/mesh.py)."""


def test_auto_mesh_kmer_axis_heuristic(monkeypatch):
    """auto_mesh turns the kmer axis on exactly when the replicated table
    footprint exceeds the per-device budget (VERDICT r4 item 9)."""
    from nextpolish2_tpu.parallel.mesh import auto_mesh, axis_size

    monkeypatch.setenv("NP2_KMER_DEVICE_BUDGET_GB", "0.001")  # 1 MB budget
    # 8 MB of tables -> needs 1.25*8/1 MB per device replicated; doubles to 8
    m = auto_mesh(yak_bytes=8 << 20)
    assert axis_size(m, "kmer") == 8 and axis_size(m, "win") == 1
    # 1.5 MB tables -> ~1.9 MB resident -> 2-way shard fits
    m = auto_mesh(yak_bytes=3 << 19)
    assert axis_size(m, "kmer") == 2 and axis_size(m, "win") == 4
    # small table: replicate (kmer axis 1)
    monkeypatch.setenv("NP2_KMER_DEVICE_BUDGET_GB", "8")
    m = auto_mesh(yak_bytes=8 << 20)
    assert axis_size(m, "kmer") == 1 and axis_size(m, "win") == 8
    # unknown footprint: pre-r5 behavior
    m = auto_mesh()
    assert axis_size(m, "kmer") == 1
