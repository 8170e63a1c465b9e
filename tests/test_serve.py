"""Serving: dynamic request batching (tools/deployment/serve.py) and the
StableHLO export→framework-free consumption roundtrip."""
import http.client
import io
import json
import subprocess
import sys
import threading

import numpy as np
import pytest

import ld_tpu  # noqa: F401
from ld_tpu import Config

PIL = pytest.importorskip('PIL')
from PIL import Image  # noqa: E402

REPO = __file__.rsplit('/tests/', 1)[0]


def _tiny_cfg():
    cfg = Config.fromfile(f'{REPO}/configs/synthetic/gfl_r18_synthetic.py')
    cfg['model']['bbox_head']['num_classes'] = 4
    cfg['model']['pretrained'] = None
    return cfg


def _jpg_bytes(seed=0, hw=(120, 160)):
    arr = np.random.RandomState(seed).randint(0, 255, (*hw, 3), np.uint8)
    buf = io.BytesIO()
    Image.fromarray(arr).save(buf, format='JPEG')
    return buf.getvalue()


def test_serve_batches_concurrent_requests():
    sys.path.insert(0, f'{REPO}/tools/deployment')
    import serve as serve_mod

    server = serve_mod.make_server(_tiny_cfg(), None, input_size=(96, 128),
                                   max_batch=4, score_thr=0.0, port=0,
                                   window_ms=50.0)
    port = server.server_address[1]
    threading.Thread(target=server.serve_forever, daemon=True).start()

    responses = [None] * 6

    def post(i):
        conn = http.client.HTTPConnection('localhost', port, timeout=300)
        conn.request('POST', '/predict', body=_jpg_bytes(i))
        r = conn.getresponse()
        responses[i] = (r.status, json.loads(r.read()))
        conn.close()

    threads = [threading.Thread(target=post, args=(i, )) for i in range(6)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()

    for status, body in responses:
        assert status == 200
        assert 'detections' in body
        for det in body['detections']:
            assert len(det['bbox']) == 4 and 'score' in det
    server.shutdown()


def test_stablehlo_export_then_framework_free_run(tmp_path):
    art = str(tmp_path / 'det.bin')
    env = dict(JAX_PLATFORMS='cpu',
               XLA_FLAGS='--xla_force_host_platform_device_count=1',
               PATH='/usr/bin:/bin:/usr/local/bin',
               PYTHONPATH=REPO, HOME='/root')
    r1 = subprocess.run(
        [sys.executable, f'{REPO}/tools/deployment/export_stablehlo.py',
         f'{REPO}/configs/synthetic/gfl_r18_synthetic.py',
         '--shape', '96', '128', '--out', art],
        capture_output=True, text=True, env=env, timeout=900)
    assert r1.returncode == 0, r1.stderr[-2000:]

    img = str(tmp_path / 'in.jpg')
    with open(img, 'wb') as f:
        f.write(_jpg_bytes(3))
    r2 = subprocess.run(
        [sys.executable, f'{REPO}/tools/deployment/run_stablehlo.py', art,
         '--image', img, '--score-thr', '0.0'],
        capture_output=True, text=True, env=env, timeout=900)
    assert r2.returncode == 0, r2.stderr[-2000:]
    out = json.loads(r2.stdout[r2.stdout.index('{'):])
    assert 'detections' in out
    # the consumer must not have imported ld_tpu
    with open(f'{REPO}/tools/deployment/run_stablehlo.py') as f:
        assert 'ld_tpu' not in [ln.split()[1] for ln in f
                                if ln.startswith(('import ', 'from '))]
