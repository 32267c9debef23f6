"""Pickle-over-HTTP policy server ("agent proxy").

Re-design of the reference mode/evaluation/agent_proxy.py:21-207: a tiny
HTTP server that hosts a policy and dispatches pickled method calls —
``__init__`` (re)creates the agent, ``__call__`` invokes it, any other
``method`` name is forwarded, ``__shutdown__`` stops the server. On handler
exceptions the agent is destroyed and recreated on the next ``__init__``
(agent_proxy.py:127-139). The wrapper applies the CALVIN observation
adaptation and gripper binarization so remote callers send raw env obs.

Server:  python -m mode_diffusion_policy_tpu.evaluation.agent_proxy --port 9088
Client:  AgentProxyClient("http://host:9088").step(obs, "open the drawer")
"""
from __future__ import annotations

import argparse
import logging
import pickle
import threading
from http.server import BaseHTTPRequestHandler, HTTPServer
from typing import Any, Callable, Dict, Optional

import numpy as np

logger = logging.getLogger(__name__)


class CalvinAgentWrapper:
    """Raw CALVIN obs -> policy step -> de-normalized action
    (agent_proxy.py:21-88)."""

    def __init__(self, policy, observation_space_keys: Dict,
                 proprio_state: Dict, image_size: int = 224):
        self.policy = policy
        self.observation_space_keys = observation_space_keys
        self.proprio_state = proprio_state
        self.relative_actions = (
            "rel_actions" in observation_space_keys["actions"])
        self.image_size = image_size

    def __getattr__(self, attr):
        return getattr(self.policy, attr)

    def step(self, obs: Dict, lang_annotation: str):
        obs_t = self._transform_observation(obs)
        action = self.policy.step(obs_t, {"lang_text": lang_annotation})
        return self._transform_action(np.asarray(action))

    def _transform_action(self, action: np.ndarray):
        action = action.squeeze()
        if self.relative_actions:
            assert action.shape[-1] == 7
            action = np.array(action, np.float64)
            action[-1] = 1 if action[-1] > 0 else -1
            return action
        if action.shape[-1] == 7:
            parts = np.split(action, [3, 6])
        elif action.shape[-1] == 8:
            parts = np.split(action, [3, 7])
        else:
            raise NotImplementedError(action.shape)
        parts[-1] = np.array([1 if parts[-1] > 0 else -1])
        return parts

    def _transform_observation(self, obs: Dict) -> Dict:
        import jax.numpy as jnp
        from ..ops.image import preprocess_camera
        out: Dict[str, Any] = {"rgb_obs": {}}
        for key in self.observation_space_keys["rgb_obs"]:
            img = np.asarray(obs["rgb_obs"][key], np.uint8)[None, None]
            out["rgb_obs"][key] = img
        out["rgb_static"] = np.asarray(preprocess_camera(
            None, jnp.asarray(out["rgb_obs"]["rgb_static"]),
            size=self.image_size, train=False))
        out["rgb_gripper"] = np.asarray(preprocess_camera(
            None, jnp.asarray(out["rgb_obs"]["rgb_gripper"]),
            size=self.image_size, train=False))
        robot = np.asarray(obs["robot_obs"], np.float32)
        sliced = [robot[slice(*ids)]
                  for ids in self.proprio_state["keep_indices"]]
        out["robot_obs"] = np.concatenate(sliced)[None, None]
        return out


class AgentHandler(BaseHTTPRequestHandler):
    create_agent: Optional[Callable] = None
    agent = None

    def log_message(self, fmt, *args):  # quiet
        logger.debug(fmt, *args)

    @classmethod
    def _destroy_agent(cls):
        cls.agent = None

    def do_POST(self):  # noqa: N802
        content_length = int(self.headers["Content-Length"])
        request = pickle.loads(self.rfile.read(content_length))
        method = request.get("method")
        try:
            if method == "__shutdown__":
                AgentHandler._destroy_agent()
                self._respond({"result": "shutdown"})
                threading.Thread(target=self.server.shutdown,
                                 daemon=True).start()
                return
            if method == "__init__":
                AgentHandler.agent = AgentHandler.create_agent()
                self._respond({"result": "agent created"})
                return
            agent = AgentHandler.agent
            if agent is None:
                raise RuntimeError("agent not initialized; call __init__")
            args = request.get("args", [])
            kwargs = request.get("kwargs", {})
            if method == "__call__":
                result = agent(*args, **kwargs)
            else:
                result = getattr(agent, method)(*args, **kwargs)
            self._respond({"result": result})
        except Exception as e:  # destroy + report (agent_proxy.py:127-139)
            logger.exception("handler error; destroying agent")
            AgentHandler._destroy_agent()
            self._respond({"error": repr(e)}, code=500)

    def _respond(self, payload: Dict, code: int = 200):
        body = pickle.dumps(payload)
        self.send_response(code)
        self.send_header("Content-Length", str(len(body)))
        self.end_headers()
        self.wfile.write(body)


def start_server(create_agent: Callable, host: str = "0.0.0.0",
                 port: int = 9088, background: bool = False) -> HTTPServer:
    """agent_proxy.py:158-166."""
    AgentHandler.create_agent = staticmethod(create_agent)
    server = HTTPServer((host, port), AgentHandler)
    logger.info("agent proxy listening on %s:%d", host, port)
    if background:
        threading.Thread(target=server.serve_forever, daemon=True).start()
        return server
    server.serve_forever()
    return server


class AgentProxyClient:
    """Client side: pickled method calls over HTTP POST."""

    def __init__(self, url: str):
        self.url = url

    def _call(self, method: str, *args, **kwargs):
        import urllib.request
        body = pickle.dumps({"method": method, "args": list(args),
                             "kwargs": kwargs})
        req = urllib.request.Request(self.url, data=body, method="POST")
        try:
            with urllib.request.urlopen(req) as resp:
                payload = pickle.loads(resp.read())
        except Exception as e:
            import urllib.error
            if isinstance(e, urllib.error.HTTPError):
                payload = pickle.loads(e.read())
            else:
                raise
        if "error" in payload:
            raise RuntimeError(payload["error"])
        return payload["result"]

    def init(self):
        return self._call("__init__")

    def __call__(self, *args, **kwargs):
        return self._call("__call__", *args, **kwargs)

    def step(self, obs, lang_annotation):
        return self._call("step", obs, lang_annotation)

    def reset(self):
        return self._call("reset")

    def shutdown(self):
        return self._call("__shutdown__")


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--port", type=int, default=9088)
    p.add_argument("--host", default="0.0.0.0")
    p.add_argument("--checkpoint", default=None)
    p.add_argument("--latent-dim", type=int, default=1024)
    p.add_argument("--n-layers", type=int, default=12)
    p.add_argument("--resnet-type", default="50")
    p.add_argument("--image-size", type=int, default=224)
    p.add_argument("--clip-checkpoint", default=None)
    p.add_argument("--serving-mode", default="auto",
                   help="fast-path preset (serving.SERVING_MODES)")
    p.add_argument("--sampler-unroll", type=int, default=1,
                   help="DDIM scan unroll factor (see evaluate_calvin)")
    args = p.parse_args(argv)
    logging.basicConfig(level=logging.INFO)

    def create_agent():
        import jax
        from types import SimpleNamespace
        from ..data.calvin_dataset import DEFAULT_OBS_SPACE, DEFAULT_PROPRIO
        from ..config.builders import build_lang_clip
        from ..models.agent import RolloutPolicy
        from ..models.encoders.lang_cache import LangEmbeddingCache
        from .evaluate_calvin import build_agent
        ns = SimpleNamespace(
            checkpoint=args.checkpoint, sampler_type="ddim",
            num_sampling_steps=10, noise_scheduler="exponential",
            sigma_min=0.001, sigma_max=80.0, latent_dim=args.latent_dim,
            n_layers=args.n_layers, resnet_type=args.resnet_type,
            image_size=args.image_size, bf16=False, no_ema=False,
            serving_mode=args.serving_mode)
        agent, variables = build_agent(ns)
        lang = build_lang_clip(clip_checkpoint=args.clip_checkpoint)
        policy = RolloutPolicy(agent, variables, LangEmbeddingCache(lang),
                               sampler_unroll=args.sampler_unroll)
        return CalvinAgentWrapper(policy, DEFAULT_OBS_SPACE, DEFAULT_PROPRIO,
                                  image_size=args.image_size)

    start_server(create_agent, args.host, args.port)


if __name__ == "__main__":
    main()
