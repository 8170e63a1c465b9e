"""Inference server with dynamic request batching over the jitted detector.

The reference's serving story is ONNX/TensorRT
(tools/deployment/pytorch2onnx.py); on TPU the jitted program IS the
deployable artifact. Static shapes mean one compile per batch size, so the
server pre-compiles the power-of-two batch sizes up to --max-batch and a
dispatcher thread coalesces queued requests into the smallest compiled
batch that fits: batch-1 latency when idle, batched MXU throughput under
load (batch 8 measures ~220 img/s vs ~205 at batch 1, docs/PERF.md).

    python tools/deployment/serve.py CONFIG CHECKPOINT --port 8080 \
        --max-batch 4
    curl -X POST --data-binary @dog.jpg localhost:8080/predict
"""
from __future__ import annotations

import argparse
import io
import json
import os
import queue
import sys
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                '..', '..'))


class _Request:
    __slots__ = ('image', 'hw', 'done', 'dets', 'labels')

    def __init__(self, image, hw):
        self.image = image          # (h, w, 3) normalized float32
        self.hw = hw                # valid (nh, nw) before padding
        self.done = threading.Event()
        self.dets = self.labels = None


class Batcher:
    """Coalesce requests into the smallest pre-compiled batch that fits."""

    def __init__(self, infer, variables, hw, sizes, window_s=0.004):
        import numpy as np
        self._np = np
        self.infer = infer
        self.variables = variables
        self.h, self.w = hw
        self.sizes = sorted(sizes)
        self.window_s = window_s
        self.q = queue.Queue()
        self._thread = threading.Thread(target=self._loop, daemon=True)
        self._thread.start()

    def submit(self, image, hw):
        req = _Request(image, hw)
        self.q.put(req)
        req.done.wait()
        return req.dets, req.labels

    def _collect(self):
        batch = [self.q.get()]
        import time
        deadline = time.monotonic() + self.window_s
        while len(batch) < self.sizes[-1]:
            remaining = deadline - time.monotonic()
            if remaining <= 0:
                break
            try:
                batch.append(self.q.get(timeout=remaining))
            except queue.Empty:
                break
        return batch

    def _loop(self):
        import jax.numpy as jnp
        np = self._np
        while True:
            batch = self._collect()
            size = next(s for s in self.sizes if s >= len(batch))
            images = np.zeros((size, self.h, self.w, 3), np.float32)
            hws = np.ones((size, 2), np.float32)
            for i, req in enumerate(batch):
                images[i] = req.image
                hws[i] = req.hw
            try:
                dets, labels, _ = self.infer(
                    self.variables, jnp.asarray(images), jnp.asarray(hws))
                dets, labels = np.asarray(dets), np.asarray(labels)
                for i, req in enumerate(batch):
                    req.dets, req.labels = dets[i], labels[i]
            except Exception as ex:  # surface device errors to the client
                for req in batch:
                    req.dets, req.labels = None, repr(ex)
            for req in batch:
                req.done.set()


def make_server(config, checkpoint, input_size=(800, 1344), max_batch=4,
                score_thr=0.3, port=8080, window_ms=4.0):
    """Build (but do not start) the HTTP server; returns it compiled+warm."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    from PIL import Image

    h, w = input_size
    from ld_tpu.apis.inference import init_detector
    det, variables = init_detector(config, checkpoint)
    mean = np.asarray([123.675, 116.28, 103.53], np.float32)
    std = np.asarray([58.395, 57.12, 57.375], np.float32)

    @jax.jit
    def infer(variables, image, img_hw):
        return det.forward_test(variables, dict(image=image, img_hw=img_hw))

    sizes = [1]
    while sizes[-1] < max_batch:
        sizes.append(min(sizes[-1] * 2, max_batch))
    for s in sizes:   # warm every compile before accepting traffic
        infer(variables, jnp.zeros((s, h, w, 3)),
              jnp.asarray([[float(h), float(w)]] * s))
    batcher = Batcher(infer, variables, (h, w), sizes,
                      window_s=window_ms / 1e3)

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
            dets, labels = batcher.submit(canvas, (float(nh), float(nw)))
            if dets is None:
                self.send_error(500, explain=str(labels))
                return
            keep = (dets[:, 4] >= score_thr) & (labels >= 0) & \
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

    return ThreadingHTTPServer(('0.0.0.0', port), Handler)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('config')
    ap.add_argument('checkpoint', nargs='?', default=None)
    ap.add_argument('--port', type=int, default=8080)
    ap.add_argument('--input-size', type=int, nargs=2, default=(800, 1344))
    ap.add_argument('--score-thr', type=float, default=0.3)
    ap.add_argument('--max-batch', type=int, default=4,
                    help='largest coalesced batch (power-of-two sizes up '
                         'to this are pre-compiled)')
    ap.add_argument('--batch-window-ms', type=float, default=4.0,
                    help='how long the dispatcher waits to fill a batch')
    args = ap.parse_args()

    server = make_server(args.config, args.checkpoint,
                         tuple(args.input_size), args.max_batch,
                         args.score_thr, args.port, args.batch_window_ms)
    h, w = args.input_size
    print(f'serving on :{args.port} (input {h}x{w}, '
          f'max batch {args.max_batch})')
    server.serve_forever()


if __name__ == '__main__':
    main()
