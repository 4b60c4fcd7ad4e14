"""Confirm: jit(recon_loss) inf vs eager finite on the same saturated input."""
import os, sys
os.environ.setdefault("JAX_PLATFORMS", "cpu")
sys.path.insert(0, "/root/repo")
import numpy as np
import jax, jax.numpy as jnp
jax.config.update("jax_platforms", "cpu")

EPS = 1e-15

def neg_term(pred):
    return -jnp.log(1.0 - pred + EPS)

x = jnp.asarray([0.3, 0.999, 1.0], jnp.float32)
print("eager:", neg_term(x))
print("jit  :", jax.jit(neg_term)(x))

# through a sigmoid, as in the real loss
def neg_from_logit(l):
    pred = jax.nn.sigmoid(l)
    return -jnp.log(1.0 - pred + EPS)

l = jnp.asarray([0.0, 10.0, 20.0, 40.0, 100.0], jnp.float32)
print("eager logits:", neg_from_logit(l))
print("jit logits  :", jax.jit(neg_from_logit)(l))

# and the grads
g = jax.jit(jax.grad(lambda l: jnp.sum(neg_from_logit(l))))
print("jit grad:", g(l))
