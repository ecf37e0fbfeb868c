"""Web serving — Gradio UI when available, stdlib HTTP server otherwise.

The reference serves a Gradio Blocks UI (app.py:563-749).  Gradio is an
optional dependency here; when absent a dependency-free HTTP server exposes
the same four tasks:

    GET  /            minimal HTML form
    GET  /health      {"status": "ok"}
    POST /inpaint     JSON {image_b64, mask_b64, prompt, task, ...} -> PNG

Requests are serialized through a lock (the reference equivalently
serializes via ``demo.queue()``, app.py:748).
"""

from __future__ import annotations

import base64
import io
import json
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
_HTML = """<!doctype html>
<title>PowerPaint-TPU</title>
<h1>PowerPaint-TPU inpainting</h1>
<p>POST JSON to /inpaint with fields: image_b64, mask_b64, prompt, task
(text-guided | shape-guided | object-removal | image-outpainting),
fitting_degree, steps, guidance_scale, seed.</p>
"""


def _run_request(pipe, payload: dict) -> bytes:
    import numpy as np
    from PIL import Image

    from powerpaint_tpu.tasks.postprocess import blend_result
    from powerpaint_tpu.tasks.preprocess import (
        crop_to_multiple_of_8,
        outpaint_canvas,
        resize_short_side,
        to_numpy_image,
        to_numpy_mask,
    )

    image = to_numpy_image(
        Image.open(io.BytesIO(base64.b64decode(payload["image_b64"])))
    )
    task = payload.get("task", "text-guided")
    short = int(payload.get("short_side", 512 if task == "image-outpainting"
                            else 640))
    image = resize_short_side(image, short)
    if task == "image-outpainting":
        image, mask = outpaint_canvas(
            image,
            float(payload.get("horizontal_expansion", 1.5)),
            float(payload.get("vertical_expansion", 1.5)),
        )
    else:
        mask = to_numpy_mask(
            Image.open(io.BytesIO(base64.b64decode(payload["mask_b64"])))
        )
        if mask.shape[:2] != image.shape[:2]:
            pil = Image.fromarray((mask * 255).astype(np.uint8))
            mask = np.asarray(
                pil.resize((image.shape[1], image.shape[0]))
            ).astype(np.float32) / 255.0
    image = crop_to_multiple_of_8(image)
    mask = mask[: image.shape[0], : image.shape[1]]

    out = pipe(
        image, mask,
        prompt=payload.get("prompt", ""),
        negative_prompt=payload.get("negative_prompt", ""),
        task=task,
        fitting_degree=float(payload.get("fitting_degree", 1.0)),
        num_inference_steps=int(payload.get("steps", 45)),
        guidance_scale=float(payload.get("guidance_scale", 7.5)),
        seed=int(payload.get("seed", 0)),
    )
    final = blend_result(out[0], image, mask)
    buf = io.BytesIO()
    Image.fromarray(final).save(buf, format="PNG")
    return buf.getvalue()


def make_server(pipe, port: int = 7860) -> ThreadingHTTPServer:
    lock = threading.Lock()

    class Handler(BaseHTTPRequestHandler):
        def log_message(self, *a):  # quiet
            pass

        def do_GET(self):
            if self.path == "/health":
                body = json.dumps({"status": "ok"}).encode()
                self.send_response(200)
                self.send_header("Content-Type", "application/json")
            else:
                body = _HTML.encode()
                self.send_response(200)
                self.send_header("Content-Type", "text/html")
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def do_POST(self):
            if self.path != "/inpaint":
                self.send_error(404)
                return
            try:
                n = int(self.headers.get("Content-Length", 0))
                payload = json.loads(self.rfile.read(n))
                with lock:  # serialize like the reference's demo.queue()
                    png = _run_request(pipe, payload)
                self.send_response(200)
                self.send_header("Content-Type", "image/png")
                self.send_header("Content-Length", str(len(png)))
                self.end_headers()
                self.wfile.write(png)
            except KeyError as e:
                body = json.dumps({"error": f"missing field {e}"}).encode()
                self.send_response(400)
                self.send_header("Content-Type", "application/json")
                self.send_header("Content-Length", str(len(body)))
                self.end_headers()
                self.wfile.write(body)
            except Exception as e:  # input errors -> 400, not a crash
                body = json.dumps(
                    {"error": f"{type(e).__name__}: {e}"}
                ).encode()
                self.send_response(400)
                self.send_header("Content-Type", "application/json")
                self.send_header("Content-Length", str(len(body)))
                self.end_headers()
                self.wfile.write(body)

    return ThreadingHTTPServer(("0.0.0.0", port), Handler)


def launch(args) -> int:
    from powerpaint_tpu.serve.cli import build_pipeline

    pipe = build_pipeline(args)
    try:
        import gradio  # noqa: F401

        return _launch_gradio(pipe, args)
    except ImportError:
        pass
    server = make_server(pipe, args.port)
    print(f"serving on http://0.0.0.0:{args.port} (POST /inpaint)")
    try:
        server.serve_forever()
    except KeyboardInterrupt:
        pass
    return 0


def _launch_gradio(pipe, args) -> int:
    """Gradio Blocks UI with the reference's four task tabs (app.py:563-749).
    Only reached when gradio is installed."""
    import gradio as gr
    import numpy as np

    from powerpaint_tpu.tasks.postprocess import blend_result, red_overlay

    def infer(image, mask, prompt, negative_prompt, task, fitting, steps,
              scale, seed):
        out = pipe(image, mask, prompt=prompt,
                   negative_prompt=negative_prompt, task=task,
                   fitting_degree=fitting, num_inference_steps=int(steps),
                   guidance_scale=scale, seed=int(seed))
        m = np.asarray(mask, np.float32)
        if m.ndim == 3:
            m = m.mean(-1)
        if m.max() > 1:
            m /= 255.0
        return [blend_result(out[0], np.asarray(image), m),
                red_overlay(np.asarray(image), m)]

    with gr.Blocks() as demo:
        gr.Markdown("# PowerPaint-TPU")
        with gr.Row():
            with gr.Column():
                image = gr.Image(label="image")
                mask = gr.Image(label="mask")
                task = gr.Radio(
                    ["text-guided", "shape-guided", "object-removal",
                     "image-outpainting"], value="text-guided", label="task")
                prompt = gr.Textbox(label="prompt")
                negative = gr.Textbox(label="negative prompt")
                fitting = gr.Slider(0.3, 1.0, value=1.0,
                                    label="fitting degree")
                steps = gr.Slider(10, 50, value=45, step=1, label="steps")
                scale = gr.Slider(0.1, 30.0, value=7.5,
                                  label="guidance scale")
                seed = gr.Slider(0, 2147483647, value=0, step=1, label="seed")
                btn = gr.Button("Run")
            with gr.Column():
                gallery = gr.Gallery(label="results")
        btn.click(
            infer,
            [image, mask, prompt, negative, task, fitting, steps, scale,
             seed],
            [gallery],
        )
    demo.queue().launch(server_name="0.0.0.0", server_port=args.port,
                        share=args.share)
    return 0
