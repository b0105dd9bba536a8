"""Flight RPC tests: our server ⇄ our client, plus cross-implementation
interop with pyarrow.flight in both directions (SURVEY §4's process-pair
integration pattern, in-process via localhost gRPC)."""

import pytest

import arrow_tpu as at
from arrow_tpu import flight

paf = pytest.importorskip("pyarrow.flight")
import pyarrow as pa  # noqa: E402


class Server(flight.FlightServerBase):
    def __init__(self):
        super().__init__("grpc://127.0.0.1:0")
        self.tables = {
            "t1": at.table({"x": [1, 2, None], "s": ["a", None, "c"]})}
        self.received = {}

    def get_flight_info(self, desc):
        name = desc.path[0].decode()
        t = self.tables[name]
        return flight.FlightInfo(
            t.schema, desc, [flight.FlightEndpoint(name.encode())],
            t.num_rows, -1)

    def do_get(self, ticket):
        return self.tables[ticket.ticket.decode()]

    def do_put(self, desc, tbl):
        self.received[desc.path[0].decode()] = tbl

    def list_flights(self, criteria):
        for name, t in self.tables.items():
            yield flight.FlightInfo(
                t.schema, flight.FlightDescriptor.for_path(name),
                [flight.FlightEndpoint(name.encode())], t.num_rows, -1)

    def do_action(self, action_type, body):
        return [b"echo:" + body]

    def list_actions(self):
        return [("ping", "echo the body")]


@pytest.fixture(scope="module")
def server():
    with Server() as srv:
        yield srv


def test_roundtrip_own_client(server):
    cli = flight.connect(f"grpc://127.0.0.1:{server.port}")
    infos = list(cli.list_flights())
    assert infos[0].total_records == 3
    info = cli.get_flight_info(flight.FlightDescriptor.for_path("t1"))
    assert info.schema.names == ["x", "s"]
    t = cli.do_get(flight.Ticket(b"t1"))
    assert t.to_pydict() == {"x": [1, 2, None], "s": ["a", None, "c"]}
    cli.do_put(flight.FlightDescriptor.for_path("up"),
               at.table({"y": [9, 8]}))
    assert server.received["up"].to_pydict() == {"y": [9, 8]}
    assert cli.do_action("ping", b"hi") == [b"echo:hi"]
    assert cli.list_actions() == [("ping", "echo the body")]
    cli.close()


def test_pyarrow_client_reads_our_server(server):
    pcli = paf.connect(f"grpc://127.0.0.1:{server.port}")
    t = pcli.do_get(paf.Ticket(b"t1")).read_all()
    assert t.to_pydict() == {"x": [1, 2, None], "s": ["a", None, "c"]}
    info = pcli.get_flight_info(paf.FlightDescriptor.for_path(b"t1"))
    assert info.total_records == 3
    pcli.close()


def test_pyarrow_client_puts_to_our_server(server):
    pcli = paf.connect(f"grpc://127.0.0.1:{server.port}")
    data = pa.table({"z": [1.5, None]})
    writer, _ = pcli.do_put(paf.FlightDescriptor.for_path(b"from_pa"),
                            data.schema)
    writer.write_table(data)
    writer.close()
    pcli.close()
    assert server.received["from_pa"].to_pydict() == {"z": [1.5, None]}


def test_our_client_reads_pyarrow_server():
    class PaServer(paf.FlightServerBase):
        def __init__(self):
            super().__init__("grpc://127.0.0.1:0")

        def do_get(self, context, ticket):
            t = pa.table({"q": [7, None, 9]})
            return paf.RecordBatchStream(t)

    with PaServer() as psrv:
        cli = flight.connect(f"grpc://127.0.0.1:{psrv.port}")
        t = cli.do_get(flight.Ticket(b"anything"))
        assert t.to_pydict() == {"q": [7, None, 9]}
        cli.close()


# --- DoExchange + auth -------------------------------------------------------

class _ExchangeServer(flight.FlightServerBase):
    def do_exchange(self, descriptor, table):
        import arrow_tpu.compute as pc
        v = pc.multiply(table.column("v").combine(), 2)
        return at.table({"v2": v})


def test_do_exchange_roundtrip():
    srv = _ExchangeServer("grpc://127.0.0.1:0")
    srv.serve()
    try:
        cli = flight.FlightClient(f"grpc://127.0.0.1:{srv.port}")
        out = cli.do_exchange(flight.FlightDescriptor.for_command(b"x"),
                              at.table({"v": [1, 2, 3]}))
        assert out.column("v2").combine().to_pylist() == [2, 4, 6]
        cli.close()
    finally:
        srv.shutdown()


def test_auth_gates_calls_and_issues_tokens():
    import grpc
    srv = _ExchangeServer(
        "grpc://127.0.0.1:0",
        auth_handler=flight.BasicServerAuthHandler({"alice": "pw"}))
    srv.serve()
    try:
        cli = flight.FlightClient(f"grpc://127.0.0.1:{srv.port}")
        with pytest.raises(grpc.RpcError):
            cli.do_exchange(flight.FlightDescriptor.for_command(b"x"),
                            at.table({"v": [1]}))
        with pytest.raises(grpc.RpcError):
            cli.authenticate_basic_token("alice", "WRONG")
        key, val = cli.authenticate_basic_token("alice", "pw")
        assert key == "authorization" and val.startswith("Bearer ")
        out = cli.do_exchange(flight.FlightDescriptor.for_command(b"x"),
                              at.table({"v": [5]}))
        assert out.column("v2").combine().to_pylist() == [10]
        cli.close()
    finally:
        srv.shutdown()


def test_pyarrow_client_auth_and_exchange_interop():
    class Echo(flight.FlightServerBase):
        def do_exchange(self, descriptor, table):
            return table

    srv = Echo("grpc://127.0.0.1:0",
               auth_handler=flight.BasicServerAuthHandler({"u": "p"}))
    srv.serve()
    try:
        pcli = paf.connect(f"grpc://127.0.0.1:{srv.port}")
        pair = pcli.authenticate_basic_token("u", "p")
        opts = paf.FlightCallOptions(headers=[pair])
        writer, reader = pcli.do_exchange(
            paf.FlightDescriptor.for_command(b"e"), options=opts)
        t = pa.table({"v": [1, 2], "s": ["a", "b"]})
        writer.begin(t.schema)
        writer.write_table(t)
        writer.done_writing()
        assert reader.read_all().to_pydict() == t.to_pydict()
        writer.close()
        with pytest.raises(paf.FlightUnauthenticatedError):
            pcli.authenticate_basic_token("u", "nope")
        pcli.close()
    finally:
        srv.shutdown()


# --- TLS (flight/server.h FlightServerOptions.tls_certificates) -------------


def _self_signed_cert():
    import datetime
    from cryptography import x509
    from cryptography.hazmat.primitives import hashes, serialization
    from cryptography.hazmat.primitives.asymmetric import rsa
    from cryptography.x509.oid import NameOID
    key = rsa.generate_private_key(public_exponent=65537, key_size=2048)
    name = x509.Name([x509.NameAttribute(NameOID.COMMON_NAME, "localhost")])
    now = datetime.datetime.now(datetime.timezone.utc)
    cert = (x509.CertificateBuilder()
            .subject_name(name).issuer_name(name)
            .public_key(key.public_key())
            .serial_number(x509.random_serial_number())
            .not_valid_before(now - datetime.timedelta(days=1))
            .not_valid_after(now + datetime.timedelta(days=365))
            .add_extension(x509.SubjectAlternativeName(
                [x509.DNSName("localhost")]), critical=False)
            .sign(key, hashes.SHA256()))
    return (cert.public_bytes(serialization.Encoding.PEM),
            key.private_bytes(serialization.Encoding.PEM,
                              serialization.PrivateFormat.TraditionalOpenSSL,
                              serialization.NoEncryption()))


def test_tls_do_get_and_pyarrow_client():
    pytest.importorskip("cryptography")
    cert_pem, key_pem = _self_signed_cert()

    class Server(flight.FlightServerBase):
        def do_get(self, ticket):
            return at.table({"x": [1, 2, 3]})

    srv = Server("grpc+tls://localhost:0",
                 tls_certificates=[(cert_pem, key_pem)])
    srv.serve()
    cli = flight.FlightClient(f"grpc+tls://localhost:{srv.port}",
                          tls_root_certs=cert_pem)
    assert cli.do_get(flight.Ticket(b"t")).to_pydict() == {"x": [1, 2, 3]}
    paf = pytest.importorskip("pyarrow.flight")
    pc2 = paf.FlightClient(f"grpc+tls://localhost:{srv.port}",
                           tls_root_certs=cert_pem)
    assert pc2.do_get(paf.Ticket(b"t")).read_all().to_pydict() == \
        {"x": [1, 2, 3]}


def test_flight_class_surface():
    assert flight.Location.for_grpc_tcp("h", 9).uri == "grpc+tcp://h:9"
    assert flight.Location.for_grpc_tls("h", 9).uri == "grpc+tls://h:9"
    a = flight.Action("refresh", b"x")
    assert a.type == "refresh" and a.body == b"x"
    assert flight.DescriptorType.CMD == 2
    assert flight.FlightMethod.DO_GET == 5
    for err in (flight.FlightError, flight.FlightInternalError,
                flight.FlightTimedOutError, flight.FlightCancelledError,
                flight.FlightServerError,
                flight.FlightUnauthenticatedError,
                flight.FlightUnauthorizedError,
                flight.FlightUnavailableError):
        assert issubclass(err, Exception)
    cert, key = flight.CertKeyPair(b"c", b"k")
    assert (cert, key) == (b"c", b"k")
    s = flight.GeneratorStream(
        at.table({"a": [1]}).schema,
        iter(at.table({"a": [1, 2]}).to_batches()))
    assert s.to_table().num_rows == 2


class TestClassSurfaceParity:
    def test_flight_class_surfaces(self):
        import pyarrow.flight as pfl

        import arrow_tpu.flight as afl
        for rc, oc in [(pfl.FlightServerBase, afl.FlightServerBase),
                       (pfl.FlightClient, afl.FlightClient),
                       (pfl.FlightDescriptor, afl.FlightDescriptor),
                       (pfl.FlightInfo, afl.FlightInfo)]:
            missing = sorted(
                {n for n in dir(rc) if not n.startswith("_")} -
                {n for n in dir(oc) if not n.startswith("_")})
            assert missing == [], (rc.__name__, missing)

    def test_descriptor_info_serialize_interop(self):
        import pyarrow.flight as pfl

        import arrow_tpu as at
        import arrow_tpu.flight as afl
        d = afl.FlightDescriptor.for_path("a", "b")
        assert pfl.FlightDescriptor.deserialize(d.serialize()).path == \
            [b"a", b"b"]
        ours = afl.FlightDescriptor.deserialize(
            pfl.FlightDescriptor.for_command(b"q").serialize())
        assert ours.command == b"q"
        info = afl.FlightInfo(at.schema([at.field("x", at.int64())]), d,
                              [afl.FlightEndpoint(b"t1")], 5, 100)
        pinfo = pfl.FlightInfo.deserialize(info.serialize())
        assert pinfo.schema.names == ["x"]
        assert pinfo.total_records == 5
        back = afl.FlightInfo.deserialize(pinfo.serialize())
        assert back.schema.names == ["x"] and back.total_records == 5

    def test_client_get_schema_and_wait(self):
        import arrow_tpu as at
        import arrow_tpu.flight as afl
        t = at.table({"k": [1, 2]})

        class Srv(afl.FlightServerBase):
            def get_flight_info(self, descriptor):
                return afl.FlightInfo(t.schema, descriptor,
                                      [afl.FlightEndpoint(b"t")], 2, -1)

        with Srv("grpc://127.0.0.1:0") as srv:
            cl = afl.FlightClient.connect(f"grpc://127.0.0.1:{srv.port}")
            cl.wait_for_available(timeout=5)
            res = cl.get_schema(afl.FlightDescriptor.for_command(b"x"))
            assert res.schema.names == ["k"]
            assert not cl.supports_async


# --- pyarrow-signature compatibility ------------------------------------------


class _PyarrowStyleServer(flight.FlightServerBase):
    """Handlers using pyarrow.flight signatures (context first,
    FlightDataStream returns) must work unchanged (server.h:248)."""

    def __init__(self, *a, **k):
        super().__init__(*a, **k)
        self.put_received = None
        self.exchanged = None

    def do_get(self, context, ticket):
        assert context.peer()
        t = at.table({"v": [1, 2, 3]})
        return flight.RecordBatchStream(t)

    def do_put(self, context, descriptor, reader, writer):
        self.put_received = reader.read_all()
        from arrow_tpu.buffer import Buffer
        writer.write(Buffer(b"ack"))

    def do_exchange(self, context, descriptor, reader, writer):
        tbl = reader.read_all()
        writer.begin(tbl.schema)
        for b in tbl.to_batches():
            writer.write_batch(b)

    def do_action(self, context, action):
        assert isinstance(action, flight.Action)
        return [flight.Result(action.body + b"!"), b"raw"]

    def list_actions(self, context):
        return [flight.ActionType("a", "does a"), ("b", "does b")]

    def get_flight_info(self, context, descriptor):
        t = at.table({"v": [1, 2, 3]})
        return flight.FlightInfo(
            t.schema, descriptor,
            [flight.FlightEndpoint(flight.Ticket(b"t"))], 3, -1)


def test_pyarrow_style_handlers():
    srv = _PyarrowStyleServer("grpc://127.0.0.1:0")
    srv.serve()
    try:
        cli = flight.connect(f"grpc://127.0.0.1:{srv.port}")
        # do_get returns a reader with read_all / read_chunk
        reader = cli.do_get(flight.Ticket(b"t"))
        assert reader.read_all().to_pydict() == {"v": [1, 2, 3]}
        # get_flight_info with context
        info = cli.get_flight_info(
            flight.FlightDescriptor.for_path("p"))
        assert info.total_records == 3
        # do_put in the pyarrow writer form
        t = at.table({"x": [9, 8]})
        writer, _meta = cli.do_put(
            flight.FlightDescriptor.for_path("p"), t.schema)
        writer.write_table(t)
        writer.close()
        assert srv.put_received.to_pydict() == {"x": [9, 8]}
        # do_exchange through reader/writer handlers
        out = cli.do_exchange(
            flight.FlightDescriptor.for_path("p"), t)
        assert out.to_pydict() == {"x": [9, 8]}
        # do_action with Action object + mixed result types
        res = cli.do_action("poke", b"hi")
        assert [bytes(b) for b in res] == [b"hi!", b"raw"]
        # list_actions with context + ActionType returns
        acts = cli.list_actions()
        assert ("a", "does a") in acts and ("b", "does b") in acts
        cli.close()
    finally:
        srv.shutdown()


class TestMiddleware:
    """Client/server middleware chains incl. tracing propagation
    (reference: flight/middleware.h, server_middleware.h,
    client_tracing_middleware.cc)."""

    def _make_server(self):
        events = []

        class RecordingMW(flight.ServerMiddleware):
            def __init__(self, method, headers):
                self.method = method
                self.headers = headers

            def sending_headers(self):
                return {"x-served-by": "arrow-tpu"}

            def call_completed(self, exc):
                events.append(("done", self.method, exc))

        class RecordingFactory(flight.ServerMiddlewareFactory):
            def start_call(self, info, headers):
                events.append(("start", info.method))
                return RecordingMW(info.method, headers)

        class Srv(flight.FlightServerBase):
            def __init__(self):
                super().__init__(
                    "grpc://127.0.0.1:0",
                    middleware={"recorder": RecordingFactory(),
                                "tracing":
                                flight.TracingServerMiddlewareFactory()})
                self.seen_trace = []

            def do_get(self, context, ticket):
                mw = context.get_middleware("tracing")
                self.seen_trace.append(dict(mw.trace_context))
                rec = context.get_middleware("recorder")
                assert rec is not None and rec.method == \
                    flight.FlightMethod.DO_GET
                return at.table({"x": [1, 2, 3]})

        return Srv, events

    def test_server_middleware_lifecycle_and_context(self):
        Srv, events = self._make_server()
        with Srv() as srv:
            cli = flight.connect(f"grpc://127.0.0.1:{srv.port}")
            t = cli.do_get(flight.Ticket(b"t")).read_all()
            assert t.num_rows == 3
            starts = [e for e in events if e[0] == "start"]
            dones = [e for e in events if e[0] == "done"]
            assert (("start", flight.FlightMethod.DO_GET) in starts)
            assert any(d[1] == flight.FlightMethod.DO_GET and
                       d[2] is None for d in dones)

    def test_client_middleware_headers_and_tracing(self):
        Srv, _ = self._make_server()
        sent, got = [], []

        class CliMW(flight.ClientMiddleware):
            def sending_headers(self):
                sent.append(True)
                return {"x-my-header": "v1"}

            def received_headers(self, headers):
                got.append(dict(headers))

            def call_completed(self, exc):
                got.append(("completed", exc))

        class CliFactory(flight.ClientMiddlewareFactory):
            def start_call(self, info):
                return CliMW()

        with Srv() as srv:
            cli = flight.FlightClient(
                f"grpc://127.0.0.1:{srv.port}",
                middleware=[CliFactory(),
                            flight.ClientTracingMiddlewareFactory()])
            cli.do_get(flight.Ticket(b"t")).read_all()
            assert sent, "client middleware never started"
            hdr_dicts = [g for g in got if isinstance(g, dict)]
            assert any("x-served-by" in h for h in hdr_dicts), hdr_dicts
            assert ("completed", None) in got
            # the server's tracing middleware saw the client traceparent
            assert srv.seen_trace and "traceparent" in srv.seen_trace[0]

    def test_pyarrow_client_sees_server_middleware_headers(self):
        """pyarrow's client middleware receives headers sent by OUR
        server middleware — cross-implementation hook interop."""
        import pyarrow.flight as pafl
        Srv, _ = self._make_server()
        got = []

        class PaMW(pafl.ClientMiddleware):
            def received_headers(self, headers):
                got.append({k.lower(): v for k, v in headers.items()})

        class PaFactory(pafl.ClientMiddlewareFactory):
            def start_call(self, info):
                return PaMW()

        with Srv() as srv:
            cli = pafl.FlightClient(f"grpc://127.0.0.1:{srv.port}",
                                    middleware=[PaFactory()])
            cli.do_get(pafl.Ticket(b"t")).read_all()
            assert any("x-served-by" in h for h in got), got
