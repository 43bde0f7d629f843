package weka.core.converters;
import weka.core.Instances;
public class ConverterUtils {
    public static class DataSource {
        public DataSource(String path) { }
        public Instances getDataSet() { throw new UnsupportedOperationException("weka stub"); }
    }
}
