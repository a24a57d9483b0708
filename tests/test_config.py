"""Expert-config auto-formulas match the reference's documented defaults
(Appendix A of SURVEY.md; reference process_args.c / interface.c)."""

from starneig_tpu.config import SchurConf, HessenbergConf, ReorderConf


def test_schur_defaults_n4000():
    c = SchurConf().resolve(4000)
    # reference transcript: tile 128-ish region -> our formula: 0.02n = 80
    assert c.tile_size == 80
    assert c.aed_window_size == 320          # max(min/0.7, 0.08n)
    assert c.aed_shift_count == 240          # max(staircase, 0.06n)
    assert c.iteration_limit == 300
    assert c.window_size == 2 * c.tile_size
    assert c.update_width == 6 * c.tile_size


def test_hessenberg_defaults_n4000():
    c = HessenbergConf().resolve(4000)
    assert c.panel_width == 288              # fitted model, interface.c:73-76
    assert c.tile_size >= 256


def test_reorder_defaults():
    c = ReorderConf().resolve(4000, select_ratio=0.35)
    assert c.window_size == 2 * c.tile_size
    assert c.small_window_size == 32
