"""CLI infrastructure: stdin streaming, progress/cancel, parameter
logging, stage profiling (VERDICT r1 #8/#10)."""
import gzip
import io
import os
import subprocess
import sys

import numpy as np
import pytest

from ngsepcore_tpu.utils import profiling
from ngsepcore_tpu.utils.progress import (
    CancelledByNotifier,
    PrintProgressNotifier,
    ProgressNotifier,
    check,
)


def test_stdin_plain_fastq(monkeypatch):
    from ngsepcore_tpu.io.fastq import FastqFileReader

    data = "@r1\nACGT\n+\nFFFF\n@r2\nGGTT\n+\nFFFF\n"
    fake = io.TextIOWrapper(io.BufferedReader(io.BytesIO(data.encode())))
    monkeypatch.setattr(sys, "stdin", fake)
    reads = list(FastqFileReader("-"))
    assert [r.name for r in reads] == ["r1", "r2"]
    assert reads[0].sequence == "ACGT"


def test_stdin_gzip_fastq(monkeypatch):
    from ngsepcore_tpu.io.fastq import FastqFileReader

    data = "@r1\nACGTA\n+\nFFFFF\n"
    gz = gzip.compress(data.encode())
    fake = io.TextIOWrapper(io.BufferedReader(io.BytesIO(gz)))
    monkeypatch.setattr(sys, "stdin", fake)
    reads = list(FastqFileReader("-"))
    assert len(reads) == 1 and reads[0].sequence == "ACGTA"


def test_progress_notifier_cancel():
    class StopAfter(ProgressNotifier):
        def __init__(self, n):
            self.n = n
            self.calls = 0

        def keep_running(self, progress):
            self.calls += 1
            return self.calls <= self.n

    n = StopAfter(2)
    check(n, 0)
    check(n, 1)
    with pytest.raises(CancelledByNotifier):
        check(n, 2)


def test_pipeline_cancellation():
    """The fused pipeline stops cooperatively when the notifier says so."""
    from ngsepcore_tpu.align.reads_aligner import ReadsAligner
    from ngsepcore_tpu.call.fused_pipeline import AlignCallPipeline
    from ngsepcore_tpu.call.single_sample import SingleSampleVariantsDetector
    from ngsepcore_tpu.core.genome import ReferenceGenome
    from ngsepcore_tpu.core.sequences import (
        QualifiedSequence,
        QualifiedSequenceList,
        RawRead,
        decode_dna,
    )

    rng = np.random.default_rng(4)
    codes = rng.integers(0, 4, 30000).astype(np.int8)
    seqs = QualifiedSequenceList()
    seqs.add(QualifiedSequence(name="chr1", codes=codes))
    genome = ReferenceGenome(seqs)
    reads = [
        RawRead(
            name=f"r{i}",
            sequence=decode_dna(codes[i * 5 : i * 5 + 100]),
            qualities="F" * 100,
        )
        for i in range(500)
    ]

    class Never(ProgressNotifier):
        def keep_running(self, progress):
            return False

    pipe = AlignCallPipeline(
        genome,
        aligner=ReadsAligner(genome),
        detector=SingleSampleVariantsDetector(genome, sample_id="s"),
    )
    pipe.progress_notifier = Never()
    with pytest.raises(CancelledByNotifier):
        pipe.run_reads(reads)


def test_profiling_ledger():
    profiling.enable()
    profiling.reset()
    with profiling.stage("unit.test_stage"):
        pass
    profiling.add("unit.manual", 0.5, calls=2)
    buf = io.StringIO()
    text = profiling.report(buf)
    assert "unit.test_stage" in text
    assert "unit.manual" in text and "x2" in text
    profiling.reset()
    profiling.enable(bool(os.environ.get("NGSEP_TPU_PROFILE")))


def test_cli_logs_parameters():
    """python -m ngsepcore_tpu VCFSummaryStats logs its parameter set."""
    golden = "/root/reference/training/yeastDemo_ann_q40_s_fi_I2_noREP_noCNV.vcf.gz"
    if not os.path.exists(golden):
        pytest.skip("golden VCF absent")
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    out = subprocess.run(
        [sys.executable, "-m", "ngsepcore_tpu", "VCFSummaryStats", "-i", golden],
        capture_output=True, text=True, timeout=240, env=env,
        cwd="/root/repo",
    )
    assert out.returncode == 0, out.stderr[-2000:]
    assert "Running VCFSummaryStats" in out.stderr
    assert "input_file" in out.stderr
