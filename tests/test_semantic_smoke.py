"""Visual semantic smoke (VERDICT r2 weak #5): the production SDS step
paints the sphere the color the constructed teacher asks for, in PIXEL
space — using the faithful-by-construction codec (see tools/semantic_smoke
for why a random tiny VAE encoder cannot support a pixel-space claim)."""

from pathlib import Path

from tools.semantic_smoke import run
import pytest

pytestmark = pytest.mark.slow  # heavy compiles; excluded from the core gate


def test_sphere_turns_red(tmp_path):
    res = run(Path(tmp_path), iters=60, grid_size=48, tex_res=16)
    # masked mean color moves strongly toward the target red
    assert res["err_after"] < 0.5 * res["err_before"], res
    c = res["color_after"]
    assert c[0] > 0.8 and c[1] < 0.4 and c[2] < 0.4, res
    # artifacts written for visual inspection
    for name in ("before.png", "after.png", "albedo_before.png",
                 "albedo_after.png", "result.json"):
        assert (Path(tmp_path) / name).exists()
