"""Serving entry point (reference app.py equivalent).

The reference launches a gradio UI plus an HTTP API; gradio isn't in this
image, so this serves a dependency-free browser UI (ui/web.py, open
http://host:port/) on top of the same /easyanimate/infer_forward +
/easyanimate/update_diffusion_transformer protocol over the stdlib HTTP
server (api/api.py + ui/ui.py parity). The reference's client
(api/post_infer.py, mirrored in easyanimate_tpu/api/client.py) also works
against it unchanged.

  python examples/app.py --model_path models/EasyAnimateV5.1-12b-zh \
      --server_port 7860

Deployment variants (reference app.py --server_mode / ui.py:1412,1842):
  --server_mode hosted   fixed-model public demo: edition/checkpoint
                         switching disabled, LoRAs only from
                         --personalized_model_dir, resolution/length caps
                         (modelscope-variant parity)
  --server_mode remote --remote_url http://tpu-host:7860
                         thin client: no local model; requests forward to a
                         remote serving host speaking the same protocol
                         (EAS-variant parity)
"""
import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--model_path",
                    help="required unless --server_mode remote")
    ap.add_argument("--pipeline", default="inpaint",
                    choices=["t2v", "inpaint", "control"])
    ap.add_argument("--text_encoder_path", default=None,
                    help="override <model_path>/text_encoder")
    ap.add_argument("--fp8", action="store_true")
    ap.add_argument("--int8", action="store_true",
                    help="W8A8 int8 block linears")
    ap.add_argument("--int4", action="store_true",
                    help="packed int4 block linears (memory mode; compute "
                         "per --int4_compute)")
    ap.add_argument("--int4_compute", default="int8",
                    choices=["int8", "bf16"],
                    help="matmul path for --int4: int8 = W4A8 (default), "
                         "bf16 = W4A16 dequant")
    ap.add_argument("--scheduler", default="Flow")
    ap.add_argument("--server_port", type=int, default=7860)
    ap.add_argument("--server_mode", default="full",
                    choices=["full", "hosted", "remote"],
                    help="full: local model, all management endpoints; "
                         "hosted: fixed-model public demo (ui_modelscope "
                         "parity); remote: thin client forwarding to "
                         "--remote_url (ui_eas parity)")
    ap.add_argument("--remote_url", default=None,
                    help="serving host for --server_mode remote")
    ap.add_argument("--personalized_model_dir", default="models",
                    help="hosted mode: the only directory LoRA names "
                         "resolve against")
    args = ap.parse_args()

    from easyanimate_tpu.api.server import EasyAnimateAPIServer

    if args.server_mode == "remote":
        if not args.remote_url:
            ap.error("--server_mode remote requires --remote_url")
        from easyanimate_tpu.ui.hosted import RemoteController

        controller = RemoteController(args.remote_url)
    else:
        if not args.model_path:
            ap.error("--model_path is required unless --server_mode remote")
        from easyanimate_tpu.loader import load_pipeline, load_text_encoders
        from easyanimate_tpu.ui.controller import EasyAnimateController

        pipe = load_pipeline(args.model_path, args.pipeline,
                             fp8_weights=args.fp8, int8_linears=args.int8,
                             int4_weights=args.int4,
                             int4_compute=args.int4_compute,
                             scheduler=args.scheduler)
        encode_text = load_text_encoders(
            args.model_path, text_encoder_path=args.text_encoder_path)
        controller = EasyAnimateController(pipeline=pipe,
                                           encode_text=encode_text)
        if args.server_mode == "hosted":
            from easyanimate_tpu.ui.hosted import HostedController

            controller = HostedController(
                controller,
                personalized_model_dir=args.personalized_model_dir)

    server = EasyAnimateAPIServer(controller)
    print(f"serving on http://0.0.0.0:{args.server_port} "
          "(browser UI at /, POST /easyanimate/infer_forward)")
    server.serve(port=args.server_port)


if __name__ == "__main__":
    main()
