"""Diffusion noise schedulers as pure functions/pytrees (jit- and scan-safe).

Replaces the diffusers schedulers the reference loads:
  - PNDM (skip_prk -> PLMS) for SD2-depth img2img
    (reference stable_diffusion_depth.py:98-100)
  - DDPM (v-prediction) for the Zero123++ SDS teacher
    (reference trainer.py:306: DDPMScheduler.from_config(pipeline.scheduler.config))
  - EulerAncestral for the Zero123++ generation path (hub pipeline default)
  - DreamTime deterministic timestep schedule
    (reference trainer.py:54-106, re-built every iteration there — here it is
    precomputed once as a (N,) int array, fixing the perf bug noted in
    SURVEY.md §7)

All schedulers share the SD "scaled_linear" beta schedule:
beta = linspace(sqrt(b0), sqrt(b1), T)^2 with b0=0.00085, b1=0.012.
"""

from __future__ import annotations

from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp


def make_alphas_cumprod(num_train_timesteps: int = 1000,
                        beta_start: float = 0.00085,
                        beta_end: float = 0.012,
                        beta_schedule: str = "scaled_linear") -> jnp.ndarray:
    if beta_schedule == "scaled_linear":
        betas = jnp.linspace(beta_start ** 0.5, beta_end ** 0.5,
                             num_train_timesteps, dtype=jnp.float64) ** 2
    elif beta_schedule == "linear":
        betas = jnp.linspace(beta_start, beta_end, num_train_timesteps,
                             dtype=jnp.float64)
    else:
        raise NotImplementedError(beta_schedule)
    return jnp.cumprod(1.0 - betas).astype(jnp.float32)


def add_noise(alphas_cumprod: jnp.ndarray, sample: jnp.ndarray,
              noise: jnp.ndarray, t) -> jnp.ndarray:
    """x_t = sqrt(acp_t) x_0 + sqrt(1-acp_t) eps (DDPM forward)."""
    acp = alphas_cumprod[jnp.asarray(t, jnp.int32)].reshape(
        (-1,) + (1,) * (sample.ndim - 1)).astype(sample.dtype)
    return jnp.sqrt(acp) * sample + jnp.sqrt(1.0 - acp) * noise


def velocity_target(alphas_cumprod: jnp.ndarray, sample: jnp.ndarray,
                    noise: jnp.ndarray, t) -> jnp.ndarray:
    """v = sqrt(acp) eps - sqrt(1-acp) x_0 (reference trainer.py:802)."""
    acp = alphas_cumprod[jnp.asarray(t, jnp.int32)].reshape(
        (-1,) + (1,) * (sample.ndim - 1)).astype(sample.dtype)
    return jnp.sqrt(acp) * noise - jnp.sqrt(1.0 - acp) * sample


def pred_x0_from_v(alphas_cumprod: jnp.ndarray, sample: jnp.ndarray,
                   v: jnp.ndarray, t) -> jnp.ndarray:
    acp = alphas_cumprod[jnp.asarray(t, jnp.int32)].reshape(
        (-1,) + (1,) * (sample.ndim - 1)).astype(sample.dtype)
    return jnp.sqrt(acp) * sample - jnp.sqrt(1.0 - acp) * v


def pred_eps_from_v(alphas_cumprod: jnp.ndarray, sample: jnp.ndarray,
                    v: jnp.ndarray, t) -> jnp.ndarray:
    acp = alphas_cumprod[jnp.asarray(t, jnp.int32)].reshape(
        (-1,) + (1,) * (sample.ndim - 1)).astype(sample.dtype)
    return jnp.sqrt(acp) * v + jnp.sqrt(1.0 - acp) * sample


# ---------------------------------------------------------------------------
# DDPM
# ---------------------------------------------------------------------------

class DDPM(NamedTuple):
    """DDPM ancestral sampler (diffusers-equivalent math, pure)."""

    alphas_cumprod: jnp.ndarray
    num_train_timesteps: int = 1000
    prediction_type: str = "epsilon"  # or "v_prediction"

    @staticmethod
    def create(num_train_timesteps: int = 1000,
               prediction_type: str = "epsilon", **beta_kw) -> "DDPM":
        return DDPM(make_alphas_cumprod(num_train_timesteps, **beta_kw),
                    num_train_timesteps, prediction_type)

    def timesteps(self, num_inference_steps: int) -> jnp.ndarray:
        ratio = self.num_train_timesteps // num_inference_steps
        return (jnp.arange(num_inference_steps) * ratio)[::-1].astype(jnp.int32)

    def scale_model_input(self, sample, t):
        return sample

    def add_noise(self, sample, noise, t):
        return add_noise(self.alphas_cumprod, sample, noise, t)

    def step(self, model_output, t, sample, key, num_inference_steps: int):
        """One ancestral reverse step x_t -> x_{t-ratio}."""
        t = jnp.asarray(t, jnp.int32)
        ratio = self.num_train_timesteps // num_inference_steps
        prev_t = t - ratio
        acp_t = self.alphas_cumprod[t]
        acp_prev = jnp.where(prev_t >= 0, self.alphas_cumprod[
            jnp.maximum(prev_t, 0)], 1.0)
        beta_prod_t = 1 - acp_t
        beta_prod_prev = 1 - acp_prev
        current_alpha = acp_t / acp_prev
        current_beta = 1 - current_alpha

        if self.prediction_type == "epsilon":
            x0 = (sample - jnp.sqrt(beta_prod_t) * model_output) / jnp.sqrt(acp_t)
        elif self.prediction_type == "v_prediction":
            x0 = pred_x0_from_v(self.alphas_cumprod, sample, model_output,
                                t.reshape(1))
        else:
            raise NotImplementedError(self.prediction_type)

        x0_coeff = jnp.sqrt(acp_prev) * current_beta / beta_prod_t
        xt_coeff = jnp.sqrt(current_alpha) * beta_prod_prev / beta_prod_t
        prev = x0_coeff * x0 + xt_coeff * sample

        variance = jnp.clip(beta_prod_prev / beta_prod_t * current_beta,
                            min=1e-20)
        noise = jax.random.normal(key, sample.shape, sample.dtype)
        prev = prev + jnp.where(t > 0, jnp.sqrt(variance), 0.0) * noise
        return prev


# ---------------------------------------------------------------------------
# Euler ancestral (Zero123++ generation default)
# ---------------------------------------------------------------------------

class EulerAncestral(NamedTuple):
    alphas_cumprod: jnp.ndarray
    num_train_timesteps: int = 1000
    prediction_type: str = "v_prediction"
    timestep_spacing: str = "trailing"

    @staticmethod
    def create(num_train_timesteps: int = 1000,
               prediction_type: str = "v_prediction",
               timestep_spacing: str = "trailing", **beta_kw) -> "EulerAncestral":
        return EulerAncestral(make_alphas_cumprod(num_train_timesteps, **beta_kw),
                              num_train_timesteps, prediction_type,
                              timestep_spacing)

    @property
    def all_sigmas(self) -> jnp.ndarray:
        return jnp.sqrt((1 - self.alphas_cumprod) / self.alphas_cumprod)

    def timesteps_and_sigmas(self, num_inference_steps: int
                             ) -> Tuple[jnp.ndarray, jnp.ndarray]:
        T = self.num_train_timesteps
        if self.timestep_spacing == "trailing":
            # diffusers rounds FIRST, then subtracts 1 — with half-to-even
            # rounding the two orders diverge by +/-1 whenever
            # T/num_inference_steps has a .5 fraction (e.g. 8/16 entries at
            # n=16; r4 code review)
            ts = jnp.arange(T, 0, -T / num_inference_steps
                            ).round().astype(jnp.int32) - 1
        else:  # linspace
            ts = jnp.linspace(0, T - 1, num_inference_steps
                              )[::-1].round().astype(jnp.int32)
        sigmas = self.all_sigmas[ts]
        sigmas = jnp.concatenate([sigmas, jnp.zeros(1)])
        return ts, sigmas

    def scale_model_input(self, sample, sigma):
        return sample / jnp.sqrt(sigma ** 2 + 1)

    def add_noise(self, sample, noise, sigma):
        return sample + noise * sigma

    def step(self, model_output, step_index, sample, sigmas, key):
        """sigmas: (num_steps+1,) from timesteps_and_sigmas."""
        sigma = sigmas[step_index]
        if self.prediction_type == "epsilon":
            x0 = sample - sigma * model_output
        elif self.prediction_type == "v_prediction":
            x0 = (model_output * (-sigma / jnp.sqrt(sigma ** 2 + 1))
                  + sample / (sigma ** 2 + 1))
        else:
            raise NotImplementedError(self.prediction_type)
        sigma_to = sigmas[step_index + 1]
        sigma_up = jnp.sqrt(sigma_to ** 2 * (sigma ** 2 - sigma_to ** 2)
                            / sigma ** 2)
        sigma_down = jnp.sqrt(sigma_to ** 2 - sigma_up ** 2)
        derivative = (sample - x0) / sigma
        dt = sigma_down - sigma
        prev = sample + derivative * dt
        noise = jax.random.normal(key, sample.shape, sample.dtype)
        return prev + noise * sigma_up


# ---------------------------------------------------------------------------
# PNDM / PLMS (skip_prk_steps=True), as used for SD2-depth
# ---------------------------------------------------------------------------

class PLMSState(NamedTuple):
    ets: jnp.ndarray  # (4, *sample_shape) ring of past eps predictions
    ets_count: jnp.ndarray  # int32 scalar
    cur_sample: jnp.ndarray
    counter: jnp.ndarray  # int32 scalar


class PNDM(NamedTuple):
    """PNDM with skip_prk_steps=True + steps_offset=1 (PLMS), scan-friendly.

    Matches diffusers' PNDMScheduler as configured in the reference
    (stable_diffusion_depth.py:98-100)."""

    alphas_cumprod: jnp.ndarray
    num_train_timesteps: int = 1000

    @staticmethod
    def create(num_train_timesteps: int = 1000, **beta_kw) -> "PNDM":
        return PNDM(make_alphas_cumprod(num_train_timesteps, **beta_kw),
                    num_train_timesteps)

    def timesteps(self, num_inference_steps: int) -> jnp.ndarray:
        """PLMS timestep sequence: the second entry is duplicated
        (diffusers pndm: plms_timesteps = concat(ts[:-1], ts[-2:-1], ts[-1:])[::-1])."""
        ratio = self.num_train_timesteps // num_inference_steps
        ts = jnp.arange(num_inference_steps) * ratio + 1  # steps_offset=1
        plms = jnp.concatenate([ts[:-1], ts[-2:-1], ts[-1:]])[::-1]
        return plms.astype(jnp.int32)

    def scale_model_input(self, sample, t):
        return sample

    def add_noise(self, sample, noise, t):
        return add_noise(self.alphas_cumprod, sample, noise, t)

    def init_state(self, sample_shape, dtype=jnp.float32) -> PLMSState:
        return PLMSState(
            ets=jnp.zeros((4,) + tuple(sample_shape), dtype),
            ets_count=jnp.zeros((), jnp.int32),
            cur_sample=jnp.zeros(sample_shape, dtype),
            counter=jnp.zeros((), jnp.int32))

    def _prev_sample(self, sample, t, prev_t, eps):
        acp_t = self.alphas_cumprod[jnp.maximum(t, 0)]
        acp_prev = jnp.where(prev_t >= 0,
                             self.alphas_cumprod[jnp.maximum(prev_t, 0)], 1.0)
        # diffusers pndm _get_prev_sample closed form
        sample_coeff = jnp.sqrt(acp_prev / acp_t)
        denom = (acp_t * jnp.sqrt(1 - acp_prev)
                 + jnp.sqrt(acp_t * (1 - acp_t) * acp_prev))
        eps_coeff = (acp_prev - acp_t) / denom
        return sample_coeff * sample - eps_coeff * eps

    def step(self, state: PLMSState, model_output, t, sample,
             num_inference_steps: int) -> Tuple[PLMSState, jnp.ndarray]:
        """One PLMS step. Returns (new_state, prev_sample).

        Linear-multistep orders ramp up 1,1,2,3,4 exactly as diffusers does
        (the counter==1 step reuses the first eps at the SAME t, advancing
        the held cur_sample)."""
        ratio = self.num_train_timesteps // num_inference_steps
        t = jnp.asarray(t, jnp.int32)
        counter = state.counter
        prev_t = t - ratio

        # counter == 1: redo from cur_sample with t := t + ratio (diffusers
        # pndm step_plms lines: prev_timestep=timestep; timestep+=ratio)
        eff_t = jnp.where(counter == 1, t + ratio, t)
        eff_prev_t = jnp.where(counter == 1, t, prev_t)

        ets = state.ets
        ets_count = state.ets_count
        store = counter != 1
        ets = jnp.where(store, jnp.roll(ets, -1, axis=0).at[-1].set(
            model_output), ets)
        ets_count = jnp.where(store, jnp.minimum(ets_count + 1, 4), ets_count)

        e1 = ets[-1]
        e2 = ets[-2]
        e3 = ets[-3]
        e4 = ets[-4]
        avg2 = (3 * e1 - e2) / 2
        avg3 = (23 * e1 - 16 * e2 + 5 * e3) / 12
        avg4 = (55 * e1 - 59 * e2 + 37 * e3 - 9 * e4) / 24

        use_sample = jnp.where(counter == 1, state.cur_sample, sample)
        cur_sample = jnp.where(counter == 0, sample, state.cur_sample)

        first = (ets_count == 1) & (counter == 0)
        second = counter == 1
        eps = jnp.where(
            first, model_output,
            jnp.where(second, (model_output + e1) / 2,
                      jnp.where(ets_count == 2, avg2,
                                jnp.where(ets_count == 3, avg3, avg4))))

        prev = self._prev_sample(use_sample, eff_t, eff_prev_t, eps)
        new_state = PLMSState(ets=ets, ets_count=ets_count,
                              cur_sample=cur_sample, counter=counter + 1)
        return new_state, prev


# ---------------------------------------------------------------------------
# DreamTime timestep schedule
# ---------------------------------------------------------------------------

def dreamtime_schedule(alphas_cumprod: jnp.ndarray, total_iterations: int,
                       m: float = 500, s: float = 125) -> jnp.ndarray:
    """Precomputed DreamTime t(i) for i in [0, N) (reference trainer.py:54-106;
    hoisted out of the loop — the reference rebuilds the scheduler every
    iteration)."""
    T = alphas_cumprod.shape[0]
    w_d = jnp.sqrt(1 - alphas_cumprod)
    ts = jnp.arange(T, dtype=jnp.float32)
    w_p = jnp.exp(-((ts - m) ** 2) / (2 * s ** 2))
    w = w_d * w_p
    w = w / w.sum()
    cumulative_survival = jnp.flip(jnp.cumsum(jnp.flip(w)))
    targets = jnp.arange(total_iterations, dtype=jnp.float32) / total_iterations
    diffs = jnp.abs(cumulative_survival[None, :] - targets[:, None])
    return jnp.argmin(diffs, axis=1).astype(jnp.int32)
