"""bench.py graded-output contract (VERDICT r5 #1).

The driver tail-captures stdout and truncated the r5 line (parsed:null)
because every attempt's per-section stamps shipped inline. The contract
now: `_assemble_output` returns a dict whose json.dumps stays well
under the tail budget even for the WORST case (3 attempts x 21 sections
x full stamps), the full blob lands in a sidecar file, and the compact
dict keeps the r3/r4 schema keys the driver parsed successfully.
"""

import json

import bench


def _fake_attempt(n_sections=21, dirty=()):
    stamp = {'load': [1.23, 1.11, 0.99], 'running': 0.4,
             'busy_cores': 0.25, 'probe_rate': 117199838.0}
    iter_amb = [{'running': 0.0, 'busy_cores': 0.05} for _ in range(3)]
    names = ['extraction_pipeline'] + [f'q_sec_{i:02d}'
                                       for i in range(n_sections - 1)]
    return {
        'timings': {n: 0.5 + 0.001 * i for i, n in enumerate(names)},
        'raw_iterations': {n: [0.5, 0.51, 0.52] for n in names},
        'section_stamps': {n: {'pre': dict(stamp),
                               'iter_ambient': iter_amb,
                               'post': dict(stamp)} for n in names},
        'dirty_sections': list(dirty),
    }


def test_stdout_line_stays_compact(tmp_path):
    attempts = [_fake_attempt(dirty=['q_sec_03']),
                _fake_attempt(dirty=['q_sec_07']),
                _fake_attempt()]
    sidecar = tmp_path / 'ATTEMPTS_LAST.json'
    out = bench._assemble_output(
        attempts, {'bench_start_ambient': [0.16, 0.3, 0.5]},
        '/root/testdata/sf0.1', 32, 40_000, [],
        {'load_max_threshold': 2.0, 'run_max_threshold': 3.0,
         'busy_max_threshold': 4.0, 'probe_min_frac': 0.75,
         'probe_best_rate': 117199838.0},
        sidecar_path=str(sidecar))
    line = json.dumps(out)
    # the r5 failure shipped tens of KB; the driver parsed ~5 KB fine
    assert len(line) < 12_000, f'stdout line too long: {len(line)}'
    # r3/r4 schema keys the driver's parser expects
    for key in ('metric', 'value', 'unit', 'queries', 'sf', 'cpus',
                'extraction_rows', 'extraction_docs_per_sec',
                'load_readings', 'raw_iterations', 'warmup_failures'):
        assert key in out
    # trust summary is bounded scalars, never nested per-section stamps
    assert set(out['load_readings']) == {
        'bench_start_ambient', 'final_attempt_worst_runnable',
        'final_attempt_worst_busy_cores', 'final_attempt_min_probe_rate'}
    assert out['dirty_sections_per_attempt'] == [['q_sec_03'],
                                                 ['q_sec_07'], []]
    # min across all attempts per query
    assert out['queries']['extraction_pipeline'] == 0.5
    assert out['extraction_docs_per_sec'] == 80_000.0
    # full blob survives in the sidecar
    blob = json.loads(sidecar.read_text())
    assert len(blob['attempt_details']) == 3
    assert 'section_stamps' in blob['attempt_details'][0]
    assert out['stamps_sidecar'] == str(sidecar)


def test_sidecar_write_failure_degrades_gracefully(tmp_path):
    out = bench._assemble_output(
        [_fake_attempt()], {'bench_start_ambient': [0.1, 0.1, 0.1]},
        '/root/testdata/sf0.01', 8, 1000, [],
        {'probe_best_rate': 1.0},
        sidecar_path=str(tmp_path / 'no_such_dir' / 'x.json'))
    assert out['stamps_sidecar'] is None
    assert out['value'] > 0
