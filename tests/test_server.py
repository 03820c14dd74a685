"""EnhanceServer: multi-tenant TCP serving over the lockstep fleet.

Gates (x64, exact engine): a network client's enhanced stream is
BIT-IDENTICAL to StreamingSession.push+flush on the same samples —
concurrently with other tenants, and for a second tenant reusing a freed
lane (reset_lanes correctness).  The server analog of SE_GUI.m's one
process / one stream, redesigned as one device program / N streams."""

import asyncio
from dataclasses import replace

import numpy as np
import jax.numpy as jnp
import pytest

from se_snmf_nat_tpu.config import default_config
from se_snmf_nat_tpu.runtime.server import EnhanceServer, enhance_over_socket
from se_snmf_nat_tpu.stream.pipeline import SnmfEnhancer
from se_snmf_nat_tpu.stream.streaming import StreamingSession


@pytest.fixture(scope="module")
def enh():
    cfg = default_config()
    cfg = cfg.evolve(
        sep=replace(cfg.sep, r_x=8, r_d=8),
        adapt=replace(cfg.adapt, r_a=4, m_a=10),
        nmf=replace(cfg.nmf, max_iter=6),
    )
    rng = np.random.default_rng(0)
    f = cfg.signal.n_bins
    bx = rng.random((f, 8)) + 1e-3
    bd = rng.random((f, 8)) + 1e-3
    return SnmfEnhancer(cfg, bx, bd, bx, bd, dtype=jnp.float64,
                        matlab_ad_blk_init=False)


def _signals(n, length, seed=7):
    rng = np.random.default_rng(seed)
    return [np.round(rng.standard_normal(length) * 2000.0)
            for _ in range(n)]


def _reference_stream(enh, x):
    sess = StreamingSession(enh)
    return np.concatenate([sess.push(x), sess.flush()])


def _run(coro):
    return asyncio.run(coro)


@pytest.mark.slow
def test_single_client_bitexact(enh):
    x = _signals(1, 4800)[0]
    want = _reference_stream(enh, x)

    async def go():
        srv = await EnhanceServer(enh, n_lanes=2, block_frames=1).start()
        try:
            return await enhance_over_socket("127.0.0.1", srv.port, x)
        finally:
            await srv.stop()

    got = _run(go())
    np.testing.assert_array_equal(got, want.astype(np.int16))


@pytest.mark.slow
def test_concurrent_clients_bitexact_and_independent(enh):
    xs = _signals(3, 4800)
    wants = [_reference_stream(enh, x) for x in xs]

    async def go():
        srv = await EnhanceServer(enh, n_lanes=4, block_frames=1).start()
        try:
            outs = await asyncio.gather(*[
                enhance_over_socket("127.0.0.1", srv.port, x, chunk=501)
                for x in xs])
        finally:
            await srv.stop()
        return outs

    outs = _run(go())
    for got, want in zip(outs, wants):
        np.testing.assert_array_equal(got, want.astype(np.int16))


@pytest.mark.slow
def test_sequential_tenants_get_fresh_lanes(enh):
    """Tenant B reuses tenant A's lane; B must match a fresh session
    bit-for-bit (state, clock and OLA chain all reset)."""
    xa, xb = _signals(2, 3200, seed=11)
    want_b = _reference_stream(enh, xb)

    async def go():
        srv = await EnhanceServer(enh, n_lanes=1, block_frames=1).start()
        try:
            await enhance_over_socket("127.0.0.1", srv.port, xa)
            # lane frees asynchronously after the first client's EOF
            for _ in range(100):
                if srv.lanes[0].state == "free":
                    break
                await asyncio.sleep(0.01)
            return await enhance_over_socket("127.0.0.1", srv.port, xb)
        finally:
            await srv.stop()

    got_b = _run(go())
    np.testing.assert_array_equal(got_b, want_b.astype(np.int16))


@pytest.mark.slow
def test_busy_refusal(enh):
    async def go():
        srv = await EnhanceServer(enh, n_lanes=1, block_frames=1).start()
        try:
            x = _signals(1, 3200)[0]
            first = asyncio.create_task(
                enhance_over_socket("127.0.0.1", srv.port, x))
            await asyncio.sleep(0.05)
            with pytest.raises(RuntimeError, match="busy"):
                await enhance_over_socket("127.0.0.1", srv.port, x)
            await first
        finally:
            await srv.stop()

    _run(go())


@pytest.mark.slow
def test_block_mode_client_bitexact(enh):
    """block_frames=8 (the latency-amortized production tick) must not
    change a client's bytes: with the exact engine, block grouping is
    bit-inert (the gated streaming==offline invariant)."""
    x = _signals(1, 4800, seed=13)[0]
    want = _reference_stream(enh, x)

    async def go():
        srv = await EnhanceServer(enh, n_lanes=2, block_frames=8).start()
        try:
            return await enhance_over_socket("127.0.0.1", srv.port, x)
        finally:
            await srv.stop()

    got = _run(go())
    np.testing.assert_array_equal(got, want.astype(np.int16))


@pytest.mark.slow
def test_abrupt_client_death_frees_fleet(enh):
    """A client that RSTs mid-stream (no clean EOF) must not wedge the
    lockstep fleet: its lane records EOF (reader finally — review finding),
    drains, and frees, while a concurrent well-behaved client completes
    bit-exactly."""
    import socket
    import struct
    xa, xb = _signals(2, 4800, seed=17)
    want_b = _reference_stream(enh, xb)

    async def go():
        srv = await EnhanceServer(enh, n_lanes=2, block_frames=1).start()
        try:
            async def rst_client():
                reader, writer = await asyncio.open_connection(
                    "127.0.0.1", srv.port)
                await reader.readline()                   # header
                pcm = np.asarray(xa[:800]).astype("<i2").tobytes()
                writer.write(pcm)
                await writer.drain()
                await asyncio.sleep(0.05)
                sock = writer.get_extra_info("socket")
                sock.setsockopt(socket.SOL_SOCKET, socket.SO_LINGER,
                                struct.pack("ii", 1, 0))  # RST on close
                writer.close()

            good = asyncio.create_task(
                enhance_over_socket("127.0.0.1", srv.port, xb, chunk=640))
            await rst_client()
            out_b = await good
            for _ in range(500):                 # dead lane must free
                if all(ln.state == "free" for ln in srv.lanes):
                    break
                await asyncio.sleep(0.01)
            states = [ln.state for ln in srv.lanes]
            return out_b, states
        finally:
            await srv.stop()

    out_b, states = _run(asyncio.wait_for(go(), timeout=120))
    np.testing.assert_array_equal(out_b, want_b.astype(np.int16))
    assert states == ["free", "free"]


@pytest.mark.slow
def test_slow_reader_cut_off_not_stalling_fleet(enh):
    """A client that keeps streaming audio but never reads its output must
    not stall other tenants: the tick never awaits per-lane drain (review
    finding), and the laggard is cut off once its write backlog passes
    max_write_buffer.  The good client completes bit-exactly."""
    import socket
    x_good = _signals(1, 6400, seed=23)[0]
    want = _reference_stream(enh, x_good)
    rng = np.random.default_rng(29)

    async def go():
        srv = await EnhanceServer(enh, n_lanes=2, block_frames=1,
                                  max_write_buffer=64).start()
        try:
            cut = asyncio.Event()

            async def slow_client():
                # clamp the CLIENT receive buffer BEFORE connect (window
                # scaling is fixed at handshake): on hosts with large
                # tcp_rmem autotuning the client kernel otherwise absorbs
                # hundreds of KB of unread output, so the server-side
                # write backlog this test waits for never materializes at
                # the ~320 B/tick production rate (measured: wbuf stayed 0
                # after 254 KB sent on a 6.18 kernel)
                sock = socket.socket(socket.AF_INET, socket.SOCK_STREAM)
                sock.setsockopt(socket.SOL_SOCKET, socket.SO_RCVBUF, 1)
                sock.setblocking(False)
                await asyncio.get_running_loop().sock_connect(
                    sock, ("127.0.0.1", srv.port))
                reader, writer = await asyncio.open_connection(sock=sock)
                await reader.readline()
                # shrink the SERVER-side send buffer for THIS lane (matched
                # by peer address) so the unread output backs into the
                # transport buffer quickly
                me = writer.get_extra_info("sockname")
                for ln in srv.lanes:
                    if ln.writer is None:
                        continue
                    s = ln.writer.get_extra_info("socket")
                    if s is not None and s.getpeername() == me:
                        s.setsockopt(socket.SOL_SOCKET, socket.SO_SNDBUF, 1)
                        ln.writer.transport.set_write_buffer_limits(0, 0)
                try:
                    while True:       # feed forever, never read
                        hop = np.round(
                            rng.standard_normal(160) * 1000.0)
                        writer.write(hop.astype("<i2").tobytes())
                        await writer.drain()
                        await asyncio.sleep(0)
                except (ConnectionResetError, BrokenPipeError, OSError):
                    cut.set()         # server aborted us — expected

            slow_task = asyncio.create_task(slow_client())
            out = await enhance_over_socket(
                "127.0.0.1", srv.port, x_good, chunk=640)
            await asyncio.wait_for(cut.wait(), timeout=60)
            slow_task.cancel()
            return out
        finally:
            await srv.stop()

    out = _run(asyncio.wait_for(go(), timeout=120))
    np.testing.assert_array_equal(out, want.astype(np.int16))


@pytest.mark.slow
def test_churn_storm_64_lanes_sharded(enh):
    """VERDICT r4 #8: 100+-connection churn against a 64-lane SHARDED
    fleet (the cli serve --sub-fleets path) — waves of well-behaved,
    aborting, trickle-then-die and deaf clients — with bit-parity
    sampling on the surviving lanes and a liveness probe at the end.

    Green means: no churn pattern wedges the lockstep fleet, freed lanes
    are handed to later waves with clean state, and every client that
    played by the rules got the SAME bytes a solo StreamingSession
    produces."""
    import socket
    import struct

    hop = enh.cfg.signal.frameshift
    n_lanes = 64
    x_par = _signals(6, 8 * hop, seed=31)          # parity-sampled signals
    wants = [_reference_stream(enh, x) for x in x_par]
    x_junk = _signals(1, 24 * hop, seed=37)[0]     # long feed for deaf

    async def go():
        srv = await EnhanceServer(enh, n_lanes=n_lanes, block_frames=2,
                                  sub_fleets=2,
                                  max_write_buffer=4096).start()
        refused = 0

        async def normal(x):
            nonlocal refused
            try:
                return await enhance_over_socket(
                    "127.0.0.1", srv.port, x, chunk=501)
            except RuntimeError:                   # busy — acceptable
                refused += 1
                return None

        async def aborter(rst: bool):
            """Connect, trickle a partial hop, die (RST or FIN)."""
            nonlocal refused
            reader, writer = await asyncio.open_connection(
                "127.0.0.1", srv.port)
            hdr = await reader.readline()
            if b"error" in hdr:
                refused += 1
                writer.close()
                return
            writer.write(b"\x01\x00" * 37)         # partial hop
            await writer.drain()
            await asyncio.sleep(0.01)
            if rst:
                sock = writer.get_extra_info("socket")
                sock.setsockopt(socket.SOL_SOCKET, socket.SO_LINGER,
                                struct.pack("ii", 1, 0))
            writer.close()

        async def deaf():
            """Feeds a long signal, never reads; must be cut off by the
            write-buffer cap, not stall the fleet."""
            nonlocal refused
            reader, writer = await asyncio.open_connection(
                "127.0.0.1", srv.port)
            hdr = await reader.readline()
            if b"error" in hdr:
                refused += 1
                writer.close()
                return
            me = writer.get_extra_info("sockname")
            for ln in srv.lanes:                   # force tiny buffers so
                if ln.writer is None:              # the cap trips fast
                    continue
                s = ln.writer.get_extra_info("socket")
                if s is not None and s.getpeername() == me:
                    s.setsockopt(socket.SOL_SOCKET, socket.SO_SNDBUF, 1)
                    ln.writer.transport.set_write_buffer_limits(0, 0)
            try:
                writer.write(x_junk.astype("<i2").tobytes())
                await writer.drain()
                for _ in range(1200):              # hold, never reading,
                    if writer.is_closing():        # until the cap cuts us
                        break
                    await asyncio.sleep(0.05)
            except (ConnectionResetError, BrokenPipeError, OSError):
                pass                               # cut off — expected
            finally:
                writer.close()

        outs = {}
        try:
            for wave in range(3):
                tasks = []
                for i, x in enumerate(x_par):
                    async def par(i=i, x=x):
                        outs[(wave, i)] = await normal(x)
                    tasks.append(par())
                tasks += [normal(x_par[0]) for _ in range(20)]
                tasks += [aborter(rst=(j % 2 == 0)) for j in range(12)]
                tasks += [deaf() for _ in range(4)]
                await asyncio.gather(*tasks)
                # let the storm's lanes drain + free before the next wave
                for _ in range(800):
                    if all(ln.state == "free" for ln in srv.lanes):
                        break
                    await asyncio.sleep(0.01)
            # liveness probe: a fresh client on the settled server
            outs["probe"] = await normal(x_par[0])
            states = [ln.state for ln in srv.lanes]
        finally:
            await srv.stop()
        return outs, refused, states

    outs, refused, states = _run(asyncio.wait_for(go(), timeout=600))
    assert states == ["free"] * n_lanes
    served = 0
    for (wave, i) in [(w, i) for w in range(3) for i in range(len(x_par))]:
        got = outs[(wave, i)]
        if got is None:
            continue
        served += 1
        np.testing.assert_array_equal(got, wants[i].astype(np.int16))
    assert served >= 12                 # parity actually sampled per wave
    np.testing.assert_array_equal(outs["probe"],
                                  wants[0].astype(np.int16))
