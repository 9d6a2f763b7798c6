#!/usr/bin/env python
"""QLoRA fine-tuning: frozen NF4 base + trainable adapters + 8-bit Adam.

Self-demo: python examples/qlora_finetune.py   (tiny model, synthetic task)
"""
import jax
import jax.numpy as jnp
import numpy as np
import optax

from bitsandbytes_sycl_tpu import optim
from bitsandbytes_sycl_tpu.models.llama import LlamaConfig, init_params
from bitsandbytes_sycl_tpu.models.lora import init_lora, merge_lora, qlora_loss_fn


def main():
    cfg = LlamaConfig.tiny(quant="nf4")
    params = init_params(cfg, jax.random.PRNGKey(0))  # frozen quantized base
    lora = init_lora(cfg, jax.random.PRNGKey(1), rank=8)
    loss_fn = qlora_loss_fn(params, cfg)

    tx = optim.adam8bit(3e-3, min_8bit_size=1024)  # blockwise 8-bit states
    opt_state = tx.init(lora)

    seq = np.tile(np.arange(1, 17), (4, 3))[:, :33]  # learn a cycle
    batch = jnp.asarray(seq, jnp.int32)

    @jax.jit
    def step(lora, opt_state):
        loss, g = jax.value_and_grad(loss_fn)(lora, batch)
        updates, opt_state = tx.update(g, opt_state, lora)
        return optax.apply_updates(lora, updates), opt_state, loss

    for i in range(60):
        lora, opt_state, loss = step(lora, opt_state)
        if i % 10 == 0:
            print(f"step {i:3d}  loss {float(loss):.4f}")
    print("final loss", float(loss))
    # merge_lora(fp_params, lora) folds adapters back for export
    _ = merge_lora


if __name__ == "__main__":
    main()
