"""The core BayesSim engine: summarize trajectories, train a mixture density
model, extract posteriors over simulation parameters.

Rebuild of ``/root/reference/bayes_sim_ig/bayes_sim.py:19-179`` with the same
training budget constants, chunked-training contract, model-class string
parsing (``MDRFF_<kernel>_<sigma>``), proposal correction, and the
multi-real-trajectory posterior combination (resample 1e4 points from the
per-trajectory mixtures, fit an unconditional MDNN, read off its single
conditional mixture).
"""

from __future__ import annotations

import numpy as np

import jax.numpy as jnp

from .distributions import pdf
from .models import MDNN, get_model_class
from .summarizers import get_summarizer


class BayesSim:
    NUM_TRAIN_TRAJ_PER_BATCH = 1000  # num trajs for each training batch
    NUM_TRAIN_EPOCHS = 10            # num times to go over the batch
    MINIBATCH_SIZE = 100             # minibatch size for NN training
    NUM_GRAD_UPDATES = (NUM_TRAIN_EPOCHS * NUM_TRAIN_TRAJ_PER_BATCH
                        // MINIBATCH_SIZE)
    TEST_FRACTION = 0.2              # fraction of dataset to use as test

    def __init__(self, model_cfg, obs_dim, act_dim, params_dim, params_lows,
                 params_highs, prior=None, proposal=None, seed=0, **kwargs):
        """Creates and initializes a BayesSim object (bayes_sim.py:27-82).

        model_cfg is the ``bayessim`` section of the task yaml; the
        summarizer's output dimension is probed by running it on zeros of
        shape (1, trainTrajLen, obs/act_dim) (bayes_sim.py:57-60).
        """
        self.prior = prior
        self.proposal = proposal
        self._refit_model = None
        model_class = model_cfg["modelClass"]
        self.summarizer_fxn = get_summarizer(model_cfg["summarizerFxn"])
        # Probe with trainTrajLen + 1 steps — the length collection
        # actually produces (collect overrides max_episode_length to
        # max_traj_len + 1, collect_trajectories.py:35-37). The reference
        # probes with trainTrajLen (bayes_sim.py:57-60), which makes the
        # corr-family feature dim disagree with the training data's for
        # trainTrajLen < 10 (no waypoint chop) and crashes the first fit
        # — documented divergence, PARITY.md.
        probe_len = int(model_cfg["trainTrajLen"]) + 1
        tmp = self.summarizer_fxn(
            jnp.zeros((1, probe_len, obs_dim)),
            jnp.zeros((1, probe_len, act_dim)))
        traj_summaries_dim = int(tmp.shape[-1])
        full_covariance = bool(model_cfg.get("fullCovariance", False))
        kwargs_model = {
            "input_dim": traj_summaries_dim, "output_dim": int(params_dim),
            "output_lows": np.asarray(params_lows),
            "output_highs": np.asarray(params_highs),
            "n_gaussians": model_cfg["components"],
            "hidden_layers": model_cfg["hiddenLayers"],
            "lr": model_cfg["lr"],
            "activation": "tanh",
            "full_covariance": full_covariance,
            "seed": seed,
        }
        if model_class.startswith("MDRFF"):
            kernel, sigma = "RBF", 4.0
            if "_" in model_class:  # e.g. MDRFF_Matern32_2.0
                parts = model_class.split("_")
                model_class = parts[0]
                kernel = parts[1]
                if len(parts) > 2:
                    sigma = float(parts[2])
            kwargs_model.update(n_feat=200, sigma=sigma, kernel=kernel)
        self.model = get_model_class(model_class)(**kwargs_model)

    @staticmethod
    def get_n_trajs_per_batch(n_train_trajs, n_train_trajs_done):
        """Next chunk size, capped so the total hits n_train_trajs exactly
        (bayes_sim.py:84-89)."""
        n = BayesSim.NUM_TRAIN_TRAJ_PER_BATCH
        if n_train_trajs_done + n > n_train_trajs:
            n = n_train_trajs - n_train_trajs_done
        return n

    def run_training(self, params, traj_states, traj_actions):
        """Summarizes one chunk of rollouts and trains the model on it
        (bayes_sim.py:91-114)."""
        traj_summaries = self.summarizer_fxn(jnp.asarray(traj_states),
                                             jnp.asarray(traj_actions))
        params = jnp.asarray(params)
        # Drop trajectories whose features or labels are non-finite (a
        # physics blow-up under extreme DR): one bad row would NaN the
        # whole MDN fit and with it every later posterior.
        ok = (jnp.isfinite(traj_summaries).all(axis=1)
              & jnp.isfinite(params).all(axis=1))
        if not bool(ok.all()):
            n_bad = int((~ok).sum())
            print(f"dropping {n_bad} non-finite trajs of {ok.shape[0]}")
            traj_summaries = traj_summaries[ok]
            params = params[ok]
        if traj_summaries.shape[0] == 0:
            # Every trajectory in the chunk blew up (the extreme-DR case
            # the drop above exists for): skip the fit entirely — an
            # empty dataset would make the jitted minibatch sampler draw
            # undefined randint(maxval=0) indices and train on garbage.
            print("all trajectories in this chunk were non-finite; "
                  "skipping the model update")
            nan = float("nan")
            return {"train_loss": [nan], "test_loss": [nan]}
        return self.model.run_training(
            x_data=traj_summaries, y_data=params,
            n_updates=BayesSim.NUM_GRAD_UPDATES,
            batch_size=BayesSim.MINIBATCH_SIZE,
            test_frac=BayesSim.TEST_FRACTION)

    def predict(self, states, actions, threshold=0.005):
        """Posterior over sim params given (surrogate-)real trajectories
        (bayes_sim.py:116-179). With several trajectories, the per-trajectory
        mixtures are combined by resampling and refitting an unconditional
        MDNN."""
        import os
        sync = bool(os.environ.get("BSIM_PHASE_SYNC"))

        def _phase(msg):
            if sync:
                print(f"[phase] predict: {msg}", flush=True)
        xs = self.summarizer_fxn(jnp.asarray(states), jnp.asarray(actions))
        if sync:
            import jax
            jax.block_until_ready(xs)
        _phase(f"summaries ready {tuple(xs.shape)}")
        mogs = self.model.predict_MoGs(xs)
        _phase(f"{len(mogs)} conditioned MoGs ready")
        if self.proposal is not None:
            for i, mog in enumerate(mogs):
                mog.prune_negligible_components(threshold=threshold)
                if isinstance(self.prior, pdf.Uniform):
                    post = mog / self.proposal
                elif isinstance(self.prior, pdf.Gaussian):
                    post = (mog * self.prior) / self.proposal
                else:
                    raise NotImplementedError(
                        f"prior type {type(self.prior)} unsupported")
                mogs[i] = post
        if len(mogs) == 1:
            return mogs[0]
        # Combine: resample the mixtures, fit a small unconditional MDNN.
        # The refit runs entirely on the host CPU backend: it is a tiny
        # posterior-combination step (1e4 samples, zeros input), and
        # compiling its trainer on the accelerator mid-run crashed the
        # remote TPU runtime reproducibly once the process already held
        # the large physics/RL programs. The model instance is also cached
        # and re-initialized per call so the CPU trainer compiles once.
        tot_smpls = int(1e4)
        n_per_mog = tot_smpls // len(mogs)
        mog_smpls = np.concatenate(
            [mog.gen(n_samples=n_per_mog) for mog in mogs], axis=0)
        _phase(f"refit samples drawn, finite="
               f"{bool(np.isfinite(mog_smpls).all())}")
        import jax
        with jax.default_device(jax.local_devices(backend="cpu")[0]):
            if self._refit_model is None:
                self._refit_model = MDNN(
                    input_dim=1, output_dim=self.model.output_dim,
                    output_lows=self.model.output_lows,
                    output_highs=self.model.output_highs,
                    n_gaussians=self.model.n_gaussians,
                    hidden_layers=(128, 128), lr=self.model.lr,
                    activation=self.model.activation,
                    # The reference passes `L_size > 0` here, which is
                    # true for ANY params_dim >= 2 and silently upgrades
                    # a diagonal-covariance model's refit to full
                    # covariance (bayes_sim.py:160). Intent is to match
                    # the main model (documented divergence, PARITY.md).
                    full_covariance=self.model.full_covariance)
            else:
                self._refit_model.reinit()
            mog_model = self._refit_model
            batch_size = 100
            n_updates = 5 * tot_smpls // batch_size
            inputs = np.zeros((mog_smpls.shape[0], 1), np.float32)
            mog_model.run_training(inputs, mog_smpls.astype(np.float32),
                                   n_updates, batch_size)
            _phase("refit trained")
            fitted = mog_model.predict_MoGs(inputs[0:1, :])
        assert len(fitted) == 1
        return fitted[0]
