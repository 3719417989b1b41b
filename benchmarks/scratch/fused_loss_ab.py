"""Train-step A/B: fused Pallas quadruplet-loss kernel vs jnp loss.

VERDICT r2 #8 asked for a measured justification of the now-wired
`LossConfig.use_fused_kernel`. Loss cost is tiny next to the encoder, so
the A/B runs (a) the full MiniLM train step both ways, and (b) the bare
loss+grad on embeddings at serving batch sizes, same process.
"""

import time

import numpy as np

import jax
import jax.numpy as jnp
import optax

jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_comp")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from qst_tpu.core.config import EncoderConfig, LossConfig
from qst_tpu.models.sentence_encoder import init_params
from qst_tpu.train.train_step import (TrainState, loss_from_config,
                                      make_train_step)


def timed(f, n=8):
    f()  # warm
    ts = []
    for _ in range(n):
        t0 = time.perf_counter()
        f()
        ts.append(time.perf_counter() - t0)
    return min(ts)


def main():
    rng = np.random.default_rng(0)

    # (b) bare loss+grad at large batch — isolates the kernel
    for B in (4096, 65536):
        embs = [jnp.asarray(rng.standard_normal((B, 384)), jnp.float32)
                for _ in range(4)]
        for fused in (False, True):
            lcfg = LossConfig(margin_pos_part=0.5, margin_part_neg=0.5,
                              use_fused_kernel=fused)
            loss = loss_from_config(lcfg)
            g = jax.jit(jax.grad(lambda a, p, t, n: loss(a, p, t, n)))
            t = timed(lambda: np.asarray(g(*embs)[:1, :1]))
            print(f"bare loss+grad B={B} fused={fused}: {t*1e3:7.2f} ms",
                  flush=True)

    # (a) full train step, MiniLM fused-layer trunk, batch 32 (reference)
    cfg = EncoderConfig.minilm_l6(use_fused_layer=True, hidden_dropout=0.0,
                                  attention_dropout=0.0)
    ids = jnp.asarray(rng.integers(5, cfg.vocab_size, (4, 32, 128)),
                      jnp.int32)
    mask = jnp.ones((4, 32, 128), jnp.int32)
    for fused in (False, True):
        lcfg = LossConfig(margin_pos_part=0.5, margin_part_neg=0.5,
                          use_fused_kernel=fused)
        tx = optax.adamw(2e-5)
        params = init_params(cfg, jax.random.key(0))
        state = TrainState(step=jnp.zeros((), jnp.int32), params=params,
                           opt_state=tx.init({"encoder": params}))
        step = make_train_step(cfg, lcfg, tx)

        def run():
            nonlocal state
            state, loss = step(state, ids, mask, jax.random.key(1))
            return float(loss)

        t = timed(run)
        print(f"full train step B=32 fused_loss={fused}: {t*1e3:7.2f} "
              f"ms/step ({1/t:.1f} steps/s)", flush=True)
    print("done")


if __name__ == "__main__":
    main()
