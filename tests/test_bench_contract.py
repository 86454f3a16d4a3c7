"""Driver contract: bench.py must print one well-formed JSON line."""

import json
import subprocess
import sys


def test_bench_json_contract():
    """Run bench.py on CPU at a tiny size; validate the stdout JSON line."""
    proc = subprocess.run(
        [
            sys.executable,
            "bench.py",
            "--measure-cpu-baseline",
            "--max-iters",
            "4",
            "--source-length",
            "16",
            "--batch-size",
            "2",
            "--repeats",
            "1",
            "--skip-rtf",
        ],
        capture_output=True,
        text=True,
        timeout=900,
        cwd=".",
    )
    assert proc.returncode == 0, proc.stderr[-2000:]
    lines = [l for l in proc.stdout.strip().splitlines() if l.strip()]
    assert len(lines) == 1, f"stdout must be exactly one JSON line: {lines}"
    record = json.loads(lines[0])
    # driver contract: the four core keys MUST be present; the record may
    # also carry the documented clock-domain companions (BASELINE.md
    # protocol: both vs_baseline_wall and vs_baseline_device_time so the
    # artifact is self-describing about what the headline ratio divides)
    assert {"metric", "value", "unit", "vs_baseline"} <= set(record)
    assert set(record) <= {
        "metric", "value", "unit", "vs_baseline",
        "vs_baseline_wall", "vs_baseline_device_time", "wall_frames_per_sec",
        "cpu_baseline_frames_per_sec", "cpu_baseline_source",
    }
    # wall-clock metric on CPU; device-time metric when a hardware xplane
    # was captured (not exercised here — CPU runs skip the capture)
    assert record["metric"] in (
        "mel_frames_per_sec_per_chip",
        "mel_frames_per_sec_per_chip_device_time",
    )
    assert record["value"] > 0
    assert record["unit"] == "frames/sec"
