package org.python.core;
public class PySystemState {
    public PyList path = new PyList();
    public PyList argv = new PyList();
}
