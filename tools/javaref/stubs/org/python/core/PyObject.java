package org.python.core;
/** Compile-only stub: jython is not available; the TimeGraph code path is
 *  never invoked by the golden driver. */
public class PyObject {
    public PyObject __call__() { throw new UnsupportedOperationException("jython stub"); }
    public PyObject __call__(PyObject a) { throw new UnsupportedOperationException("jython stub"); }
    public PyObject __call__(PyObject a, PyObject b) { throw new UnsupportedOperationException("jython stub"); }
    public PyObject __call__(PyObject a, PyObject b, PyObject c) { throw new UnsupportedOperationException("jython stub"); }
    public PyObject __call__(PyObject a, PyObject b, PyObject c, PyObject d) { throw new UnsupportedOperationException("jython stub"); }
    public PyObject __getattr__(String name) { throw new UnsupportedOperationException("jython stub"); }
}
