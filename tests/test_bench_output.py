"""bench.py graded-output contract (VERDICT r6 #1).

The driver tail-captures only ~2,000 characters of stdout: BENCH_r03
and BENCH_r04 — the last artifacts the driver parsed — have exactly
2,000-char tails, and the r5 (tens of KB) AND r6 (~2.7 KB) lines both
came back parsed:null. The contract now: the stdout JSON line fits in
bench.STDOUT_BUDGET (1,800 bytes) even for the WORST case (3 attempts
x 23 sections, every attempt dirty), raw_iterations NEVER ship inline
(the sidecar carries the full per-attempt blob), and the compact dict
keeps the r3/r4 schema keys the driver parsed successfully.
"""

import json

import bench


def _fake_attempt(n_sections=23, dirty=()):
    stamp = {'load': [1.23, 1.11, 0.99], 'running': 0.4,
             'busy_cores': 0.25, 'probe_rate': 117199838.0}
    iter_amb = [{'running': 0.0, 'busy_cores': 0.05} for _ in range(3)]
    names = ['extraction_pipeline'] + [f'q_section_name_{i:02d}'
                                       for i in range(n_sections - 1)]
    return {
        'timings': {n: 0.5 + 0.001 * i for i, n in enumerate(names)},
        'raw_iterations': {n: [0.5, 0.51, 0.52] for n in names},
        'section_stamps': {n: {'pre': dict(stamp),
                               'iter_ambient': iter_amb,
                               'post': dict(stamp)} for n in names},
        'dirty_sections': list(dirty),
    }


def _worst_case_output(sidecar):
    # worst realistic case: 3 attempts, every attempt has dirty
    # sections with long names, warmup failures present
    attempts = [
        _fake_attempt(dirty=[f'q_section_name_{i:02d}' for i in range(6)]),
        _fake_attempt(dirty=[f'q_section_name_{i:02d}' for i in range(4, 9)]),
        _fake_attempt(dirty=['q_section_name_22']),
    ]
    return bench._assemble_output(
        attempts, {'bench_start_ambient': [0.16, 0.3, 0.5]},
        '/root/testdata/sf0.1', 32, 40_000,
        ['warmup_fail_one', 'warmup_fail_two'],
        {'load_max_threshold': 2.0, 'run_max_threshold': 3.0,
         'busy_max_threshold': 4.0, 'probe_min_frac': 0.75,
         'probe_best_rate': 117199838.0},
        sidecar_path=str(sidecar))


def test_stdout_line_fits_driver_tail_capture(tmp_path):
    out = _worst_case_output(tmp_path / 'ATTEMPTS_LAST.json')
    line = bench._budget_line(dict(out))
    # THE contract: the driver captures ~2,000 chars; we must fit with
    # headroom even at the 3-attempt / all-dirty worst case
    assert len(line) <= bench.STDOUT_BUDGET, \
        f'stdout line too long for the driver tail: {len(line)}'
    parsed = json.loads(line)
    # graded keys must survive any shedding
    for key in ('metric', 'value', 'unit', 'queries', 'sf', 'cpus',
                'extraction_rows', 'extraction_docs_per_sec'):
        assert key in parsed
    assert len(parsed['queries']) == 23  # no shedding needed normally


def test_raw_iterations_never_inline(tmp_path):
    sidecar = tmp_path / 'ATTEMPTS_LAST.json'
    out = _worst_case_output(sidecar)
    assert out['raw_iterations'] == 'see stamps_sidecar'
    # full blob survives in the sidecar
    blob = json.loads(sidecar.read_text())
    assert len(blob['attempt_details']) == 3
    assert 'section_stamps' in blob['attempt_details'][0]
    assert 'raw_iterations' in blob['attempt_details'][0]
    assert out['stamps_sidecar'] == str(sidecar)


def test_schema_and_values(tmp_path):
    out = _worst_case_output(tmp_path / 'ATTEMPTS_LAST.json')
    # r3/r4 schema keys the driver's parser expects
    for key in ('metric', 'value', 'unit', 'queries', 'sf', 'cpus',
                'extraction_rows', 'extraction_docs_per_sec',
                'load_readings', 'warmup_failures'):
        assert key in out
    # trust summary is bounded scalars, never nested per-section stamps
    assert set(out['load_readings']) == {
        'bench_start_ambient', 'final_attempt_worst_runnable',
        'final_attempt_worst_busy_cores', 'final_attempt_min_probe_rate'}
    # dirty names capped at 4 per attempt, warmup failures at 4
    assert [len(d) for d in out['dirty_sections_per_attempt']] == [4, 4, 1]
    assert out['warmup_failures'] == ['warmup_fail_one', 'warmup_fail_two']
    # min across all attempts per query
    assert out['queries']['extraction_pipeline'] == 0.5
    assert out['extraction_docs_per_sec'] == 80_000.0


def test_budget_line_sheds_progressively():
    # synthetic oversized dict: shedding drops trust detail but keeps
    # graded numbers
    big = {
        'metric': 'm', 'value': 1.0, 'unit': 'sec',
        'queries': {f'q_{i}': 1.0 for i in range(23)},
        'sf': 0.1, 'cpus': 32, 'extraction_rows': 40_000,
        'extraction_docs_per_sec': 17_000.0,
        'load_readings': {'x': 'y' * 3_000},
        'dirty_sections_per_attempt': [['a' * 2_000]],
        'warmup_failures': ['b' * 2_000],
        'stamps_sidecar': '/tmp/x.json',
    }
    line = bench._budget_line(big)
    assert len(line) <= bench.STDOUT_BUDGET
    parsed = json.loads(line)
    assert 'load_readings' not in parsed
    assert parsed['value'] == 1.0
    assert len(parsed['queries']) == 23


def test_sidecar_write_failure_degrades_gracefully(tmp_path):
    out = bench._assemble_output(
        [_fake_attempt()], {'bench_start_ambient': [0.1, 0.1, 0.1]},
        '/root/testdata/sf0.01', 8, 1000, [],
        {'probe_best_rate': 1.0},
        sidecar_path=str(tmp_path / 'no_such_dir' / 'x.json'))
    assert out['stamps_sidecar'] is None
    assert out['value'] > 0
