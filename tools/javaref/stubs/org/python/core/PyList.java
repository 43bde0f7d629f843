package org.python.core;
public class PyList extends PyObject {
    public void append(PyObject o) { throw new UnsupportedOperationException("jython stub"); }
}
