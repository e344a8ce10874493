"""LoRA fine-tuning driver (reference scripts/train_lora.py equivalent).

Thin wrapper over examples/train.py: LoRA training is the same data +
denoising-loss loop with only the low-rank factors trainable, so this just
defaults --lora_rank on and forwards everything else.

  python examples/train_lora.py --train_data_meta meta.json \
      --model_path ... --lora_rank 128
"""
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

if __name__ == "__main__":
    if not any(a.startswith("--lora_rank") for a in sys.argv[1:]):
        sys.argv += ["--lora_rank", "128"]
    from examples.train import main

    main()
