import json
import os

import numpy as np
import pytest

from necat_tpu.io import simulate, seqio
from necat_tpu.io.readstore import ReadStore
from necat_tpu.pipeline import cli, config as config_mod
from necat_tpu.pipeline.stages import Project


def test_config_template_roundtrip(tmp_path):
    p = tmp_path / "t.cfg"
    config_mod.write_template(p)
    cfg = config_mod.load_config(p)
    assert cfg.num_iter == 2
    assert cfg.min_read_length == 3000
    assert cfg.polish


def test_parse_genome_size():
    assert config_mod.parse_genome_size("4600000") == 4600000
    assert config_mod.parse_genome_size("4.6m") == 4600000
    assert config_mod.parse_genome_size("120k") == 120000


@pytest.mark.slow
def test_pipeline_assemble_end_to_end(tmp_path):
    G = 20000
    genome = simulate.random_genome(G, seed=77)
    em = simulate.ErrorModel(sub=0.025, ins=0.025, dele=0.025)
    reads, *_ = simulate.simulate_reads(genome, coverage=9, mean_len=5000,
                                        min_len=3000, max_len=8000, em=em,
                                        seed=3, circular=False)
    reads_path = tmp_path / "reads.fasta"
    ReadStore.from_seqs(reads).to_fasta(reads_path)
    rl = tmp_path / "read_list.txt"
    rl.write_text(f"{reads_path}\n")
    cfg_path = tmp_path / "run.cfg"
    cfg_path.write_text(
        f"PROJECT={tmp_path}/prj\nONT_READ_LIST={rl}\nGENOME_SIZE=20000\n"
        "MIN_READ_LENGTH=3000\nPREP_OUTPUT_COVERAGE=40\nCNS_OUTPUT_COVERAGE=30\n"
        "NUM_ITER=1\nPOLISH_CONTIGS=false\n")

    rc = cli.main(["assemble", str(cfg_path)])
    assert rc == 0
    ctg_path = f"{tmp_path}/prj/4-fsa/contigs.fasta"
    assert os.path.exists(ctg_path)
    contigs = ReadStore.from_fasta(ctg_path)
    assert contigs.n_reads >= 1
    assert contigs.lengths.max() >= G * 0.5

    # resume: stage manifests mark everything up to date; a rerun must skip
    done = json.load(open(f"{tmp_path}/prj/4-fsa/assemble.done.json"))
    assert done["rc"] == 0
    mtime = os.path.getmtime(ctg_path)
    rc = cli.main(["assemble", str(cfg_path)])
    assert rc == 0
    assert os.path.getmtime(ctg_path) == mtime, "stage was not skipped on rerun"

    # editing an option string a stage consumes must invalidate its manifest
    # and force a rerun (Plgd reruns when the script text changes,
    # Project.pm:131-177) — round-3 regression: params={} ignored FSA_* edits
    with open(cfg_path, "a") as f:
        f.write("FSA_OL_FILTER_OPTIONS=--min_identity=90\n")
    rc = cli.main(["assemble", str(cfg_path)])
    assert rc == 0
    assert os.path.getmtime(ctg_path) > mtime, \
        "assemble must rerun when FSA_OL_FILTER_OPTIONS changes"


def test_stage_retries_then_succeeds(tmp_path):
    from necat_tpu.pipeline import stages

    calls = {"n": 0}
    out = tmp_path / "out.txt"
    inp = tmp_path / "in.txt"
    inp.write_text("x")

    def flaky():
        calls["n"] += 1
        if calls["n"] < 3:
            raise RuntimeError("transient")
        out.write_text("done")

    ran = stages._stage(str(tmp_path), "flaky", [str(inp)], [str(out)], {}, flaky)
    assert ran and calls["n"] == 3 and out.read_text() == "done"
    # second invocation skips (manifest + outputs up to date)
    assert not stages._stage(str(tmp_path), "flaky", [str(inp)], [str(out)], {}, flaky)
    assert calls["n"] == 3


def test_stage_gives_up_after_budget(tmp_path):
    import pytest
    from necat_tpu.pipeline import stages

    inp = tmp_path / "in.txt"
    inp.write_text("x")

    def always_fails():
        raise RuntimeError("permanent")

    with pytest.raises(RuntimeError):
        stages._stage(str(tmp_path), "bad", [str(inp)], [], {}, always_fails)
    assert not (tmp_path / "bad.done.json").exists()


def test_option_string_parsing():
    from necat_tpu.overlap.options import MapOptions
    from necat_tpu.consensus.options import CnsOptions

    m = MapOptions.from_string("-n 500 -z 20 -b 2000 -e 0.5 -j 0 -u 1 -a 1000")
    assert m.ncan == 500 and m.scan_window == 20 and m.align_size_cutoff == 1000
    assert m.kmer_size == 15  # untouched default
    m2 = MapOptions.from_string("-k 13 -q 300", MapOptions(ncan=100))
    assert m2.kmer_size == 13 and m2.occ_cutoff == 300 and m2.ncan == 100

    c = CnsOptions.from_string("-a 2000 -x 4 -y 12 -l 1000 -e 0.5 -p 0.8 -u 0 -r 1")
    assert c.min_align_size == 2000 and c.min_size == 1000
    assert c.rescue_long_indels and not c.use_fixed_ident_cutoff
    c2 = CnsOptions.from_string("-f 1")
    assert c2.full_consensus
