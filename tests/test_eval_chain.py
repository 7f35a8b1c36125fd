"""Whole evaluation stack chained end-to-end (mirrors reference
script/Evaluation.sh): CLI generation (vanilla + RegionE) -> pixel metrics
-> merge -> VIEScore (dry-run backbone) -> stats."""

import json
from pathlib import Path

import numpy as np

from tests.test_cli import tiny_cli  # fixture reuse  # noqa: F401


def test_full_eval_chain(tiny_cli, tmp_path):  # noqa: F811
    from PIL import Image
    # build a 2-item benchmark task
    task = tmp_path / "bench" / "TE"
    (task / "img").mkdir(parents=True)
    with open(task / "metadata.jsonl", "w") as fh:
        for k in range(2):
            img = (np.random.default_rng(k).random((32, 32, 3)) * 255
                   ).astype(np.uint8)
            Image.fromarray(img).save(task / "img" / f"k{k}.png")
            fh.write(json.dumps({"key": f"k{k}", "image": f"k{k}.png",
                                 "prompt": f"edit {k}"}) + "\n")

    common = ["--threshold", "0.0", "--erosion_dilation", "False",
              "--evaluation", "--eval_dir", str(tmp_path / "bench"),
              "--size_level", "32"]
    tiny_cli.main(common + ["--output_dir", str(tmp_path / "vanilla")])
    tiny_cli.main(common + ["--use_regione",
                            "--output_dir", str(tmp_path / "regione")])

    # pixel metrics + merge (reference metric_all_task + metric_merge)
    from regione_tpu.eval import merge, metrics
    res = metrics.run_all_tasks(str(tmp_path / "vanilla"),
                                str(tmp_path / "regione"), with_lpips=False)
    assert len(res["TE"]) == 2
    text = merge.merge_direction(str(tmp_path / "regione"))
    assert "PSNR:" in text and "Latency:" in text

    # VIEScore dry-run sweep + stats (reference run_gedit_score)
    from regione_tpu.eval import run_viescore
    run_viescore.main(["--data_dir", str(tmp_path / "bench"),
                       "--gen_root", str(tmp_path / "regione"),
                       "--backbone", "dryrun"])
    csvp = tmp_path / "regione" / "TE" / "dryrun_vie_score.csv"
    assert csvp.exists()
    from regione_tpu.eval.viescore import analyze_scores
    stats = analyze_scores([str(csvp)])
    assert stats["n"] == 2 and 0 <= stats["overall"]["o"] <= 10
